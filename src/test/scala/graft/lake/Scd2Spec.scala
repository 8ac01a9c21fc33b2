package graft.lake

import graft.SparkSpec

/** Incremental SCD2 maintenance: apply(batch) must equal a single-shot
  * rebuild over the concatenated change log, one atomic commit per
  * apply. (The e2e equivalence at fixture scale is oracle-checked by
  * `scd2_incremental_apply`.) */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def dims(store: TableStore, table: String) =
    store.read(table)
      .select("key", "tier", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
      .sortBy(t => (t._1, t._3)).toSeq

  test("apply closes open versions, drops cross-batch no-ops, carries untouched keys") {
    val store = new TableStore(spark, tmpDir("scd2"))
    Scd2.apply(store, "dim",
      Seq((1L, 10L, "bronze"), (2L, 10L, "bronze")).toDF("key", "ts", "tier"),
      Seq("key"), "ts", Seq("tier"))
    assert(store.currentVersion("dim").contains(0L))
    // batch 2: key 1 re-emits bronze (no-op) then goes silver;
    // key 2 untouched; key 3 is new
    Scd2.apply(store, "dim",
      Seq((1L, 20L, "bronze"), (1L, 30L, "silver"), (3L, 25L, "gold"))
        .toDF("key", "ts", "tier"),
      Seq("key"), "ts", Seq("tier"))
    assert(store.currentVersion("dim").contains(1L)) // one commit per apply
    assert(dims(store, "dim") == Seq(
      (1L, "bronze", 10L, Some(30L), false), // closed by silver, not the no-op
      (1L, "silver", 30L, None, true),
      (2L, "bronze", 10L, None, true),       // untouched, still open
      (3L, "gold", 25L, None, true)))
  }

  test("a chain of applies equals the single-shot build") {
    val log = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 20L, "b"), (1L, 40L, "a"),
      (2L, 15L, "x"), (2L, 35L, "x"), (2L, 45L, "y"))
    val one = new TableStore(spark, tmpDir("scd2one"))
    Scd2.apply(one, "d", log.toDF("key", "ts", "tier"),
      Seq("key"), "ts", Seq("tier"))
    val inc = new TableStore(spark, tmpDir("scd2inc"))
    for (cut <- Seq(log.filter(_._2 <= 15), log.filter(r => r._2 > 15 && r._2 <= 35),
                    log.filter(_._2 > 35)))
      Scd2.apply(inc, "d", cut.toDF("key", "ts", "tier"),
        Seq("key"), "ts", Seq("tier"))
    assert(dims(inc, "d") == dims(one, "d"))
  }
}
