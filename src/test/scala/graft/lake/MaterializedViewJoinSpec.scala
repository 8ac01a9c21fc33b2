package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join materialized views ([[MaterializedView.createJoined]]): the
  * maintained view must always equal the from-scratch join-aggregate
  * over the CURRENT fact and dim states — under fact appends, fact
  * MoR deletes, dim updates, both sides moving at once, N:M join
  * multiplicity, NULL measures, and a filter over dim columns. The
  * identity under test is Δ(F⋈D) = ΔF⋈D_new ⊕ F_old⋈ΔD with both
  * cursors advancing in one atomic commit. */
class MaterializedViewJoinSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore() = new TableStore(spark, tmpDir("mvj"))

  private def fact(rows: (Long, Long, java.lang.Double)*): DataFrame =
    rows.toDF("id", "k", "x")
  private def dim(rows: (Long, String)*): DataFrame =
    rows.toDF("k", "seg")

  /** view read == recompute(join + groupBy seg) over current state. */
  private def assertParity(store: TableStore, mv: String,
                           filter: Option[String] = None): Unit = {
    val got = MaterializedView.read(store, mv)
      .select(col("seg"), col("cnt"), col("sum_x"))
      .orderBy("seg").collect().toSeq
    val joined0 = store.read("f").join(store.read("d"), Seq("k"))
    val joined = filter.fold(joined0)(f => joined0.where(expr(f)))
    val want = joined
      .groupBy("seg").agg(count(lit(1)).as("cnt"), sum("x").as("sum_x"))
      .orderBy("seg").collect().toSeq
    assert(got == want, s"join MV diverged:\n got  $got\n want $want")
  }

  test("fact-side IVM: appends and MoR deletes fold; net-zero groups vanish") {
    val store = freshStore()
    store.create("f", fact((1, 10, 1.0), (2, 10, 2.0), (3, 20, 3.0)))
    store.create("d", dim((10, "a"), (20, "b")))
    MaterializedView.createJoined(store, "m", "f", "d", Seq("k"),
      Seq("seg"), Seq("x"))
    assertParity(store, "m")
    store.append("f", fact((4, 20, 4.0), (5, 10, 5.0)))
    MaterializedView.refresh(store, "m")
    assertParity(store, "m")
    // delete every row of group b → it must vanish, not read cnt=0
    store.appendWithDeletes("f", fact().limit(0),
      deleteKeys = Seq(3L, 4L).toDF("id"))
    MaterializedView.refresh(store, "m")
    assertParity(store, "m")
    assert(!MaterializedView.read(store, "m").select("seg").as[String]
      .collect().contains("b"))
  }

  test("dim-side IVM: a dim update re-keys the affected fact rows exactly") {
    val store = freshStore()
    store.create("f", fact((1, 10, 1.0), (2, 10, 2.0), (3, 20, 3.0)))
    store.create("d", dim((10, "a"), (20, "b")))
    MaterializedView.createJoined(store, "m", "f", "d", Seq("k"),
      Seq("seg"), Seq("x"))
    // move key 10 from segment a to segment c: MoR delete + reinsert
    store.appendWithDeletes("d", dim((10, "c")),
      deleteKeys = Seq(10L).toDF("k"))
    MaterializedView.refresh(store, "m")
    assertParity(store, "m")
    assert(!MaterializedView.read(store, "m").select("seg").as[String]
      .collect().contains("a"))
  }

  test("both sides move between refreshes; one refresh folds both; replay no-ops") {
    val store = freshStore()
    store.create("f", fact((1, 10, 1.0), (3, 20, 3.0)))
    store.create("d", dim((10, "a"), (20, "b")))
    MaterializedView.createJoined(store, "m", "f", "d", Seq("k"),
      Seq("seg"), Seq("x"))
    store.append("f", fact((4, 30, 4.0), (5, 10, 5.0)))
    store.appendWithDeletes("d", dim((20, "z"), (30, "n")),
      deleteKeys = Seq(20L).toDF("k"))
    val bound = MaterializedView.refresh(store, "m")
    assertParity(store, "m")
    val mvV = store.currentVersion("m").get
    // idle refresh: nothing moved, no new version, same bound
    assert(MaterializedView.refresh(store, "m") == bound)
    assert(store.currentVersion("m").get == mvV)
  }

  test("dim-only change lands a delta (the fact cursor stays put)") {
    val store = freshStore()
    store.create("f", fact((1, 10, 1.0), (2, 20, 2.0)))
    store.create("d", dim((10, "a"), (20, "b")))
    MaterializedView.createJoined(store, "m", "f", "d", Seq("k"),
      Seq("seg"), Seq("x"))
    val before = store.currentVersion("m").get
    store.appendWithDeletes("d", dim((20, "a")), deleteKeys = Seq(20L).toDF("k"))
    MaterializedView.refresh(store, "m")
    assert(store.currentVersion("m").get > before)
    assertParity(store, "m")
  }

  test("N:M multiplicity: duplicate join keys on the dim side count per match") {
    val store = freshStore()
    store.create("f", fact((1, 10, 1.0), (2, 10, 2.0)))
    // key 10 appears twice in d → every fact row joins twice
    store.create("d", dim((10, "a"), (10, "b")))
    MaterializedView.createJoined(store, "m", "f", "d", Seq("k"),
      Seq("seg"), Seq("x"))
    assertParity(store, "m")
    store.append("f", fact((3, 10, 3.0)))
    store.append("d", dim((10, "a"))) // now a matches twice per row
    MaterializedView.refresh(store, "m")
    assertParity(store, "m")
  }

  test("filter over dim columns stays self-maintainable; NULL measures; avg") {
    val store = freshStore()
    store.create("f", fact((1, 10, 1.0), (2, 10, null), (3, 20, 3.0)))
    store.create("d", dim((10, "keep"), (20, "drop")))
    MaterializedView.createJoined(store, "m2", "f", "d", Seq("k"),
      Seq("seg"), Seq("x"), filter = Some("seg <> 'drop'"),
      avgCols = Seq("x"))
    def parity(): Unit = {
      val got = MaterializedView.read(store, "m2")
        .select(col("seg"), col("cnt"), col("sum_x"), col("avg_x"))
        .orderBy("seg").collect().toSeq
      val want = store.read("f").join(store.read("d"), Seq("k"))
        .where("seg <> 'drop'")
        .groupBy("seg").agg(count(lit(1)).as("cnt"), sum("x").as("sum_x"),
          avg("x").as("avg_x"))
        .orderBy("seg").collect().toSeq
      assert(got == want, s"filtered join MV diverged:\n got  $got\n want $want")
    }
    parity()
    // flip key 20 into the filter and add a NULL-measure row to 10
    store.appendWithDeletes("d", dim((20, "keep2")),
      deleteKeys = Seq(20L).toDF("k"))
    store.append("f", fact((4, 10, null), (5, 20, 5.0)))
    MaterializedView.refresh(store, "m2")
    parity()
  }

  test("compactPartials folds to one row per group and keeps BOTH bindings") {
    val store = freshStore()
    store.create("f", fact((1, 10, 1.0), (2, 20, 2.0)))
    store.create("d", dim((10, "a"), (20, "b")))
    MaterializedView.createJoined(store, "m", "f", "d", Seq("k"),
      Seq("seg"), Seq("x"))
    store.append("f", fact((3, 10, 3.0)))
    MaterializedView.refresh(store, "m")
    store.appendWithDeletes("d", dim((20, "c")), deleteKeys = Seq(20L).toDF("k"))
    MaterializedView.refresh(store, "m")
    MaterializedView.compactPartials(store, "m")
    // exactly one physical row per surviving group after the fold
    assert(store.read("m").groupBy("seg").count()
      .where(col("count") > 1).isEmpty)
    assertParity(store, "m")
    // both cursors survived the fold: further ingest on both sides
    // still refreshes exactly
    store.append("f", fact((6, 20, 6.0)))
    store.appendWithDeletes("d", dim((10, "z")), deleteKeys = Seq(10L).toDF("k"))
    MaterializedView.refresh(store, "m")
    assertParity(store, "m")
  }

  test("describe reports the dim cursor; maintenance on the DIM refreshes the view") {
    val root = tmpDir("mvj-maint")
    val store = new TableStore(spark, root)
    store.create("f", fact((1, 10, 1.0), (2, 20, 2.0)))
    store.create("d", dim((10, "a"), (20, "b")))
    MaterializedView.createJoined(store, "m", "f", "d", Seq("k"),
      Seq("seg"), Seq("x"))
    store.appendWithDeletes("d", dim((20, "c")), deleteKeys = Seq(20L).toDF("k"))
    val desc = MaterializedView.describe(store, "m").collect().head
    assert(desc.getAs[String]("dim") == "d")
    assert(desc.getAs[Long]("dim_versions_behind") > 0L)
    // a maintenance pass over the DIM table must discover the view
    // through its mv-dimsync watermark and catch it up
    val report = MaintenanceJob.run(spark, MaintenanceJob.Args(root, "d"))
    assert(report.viewsRefreshed.exists(_.startsWith("m")),
      s"expected maintenance on d to refresh m, got ${report.viewsRefreshed}")
    assertParity(store, "m")
    val desc2 = MaterializedView.describe(store, "m").collect().head
    assert(desc2.getAs[Long]("dim_versions_behind") == 0L)
  }
}
