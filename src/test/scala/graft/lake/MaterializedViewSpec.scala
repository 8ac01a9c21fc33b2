package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore() = new TableStore(spark, tmpDir("mv"))

  private def src(rows: (Long, String, Double)*): DataFrame =
    rows.toDF("id", "g", "x")

  /** The invariant every leg asserts: the MV's consolidated read ==
    * a from-scratch GROUP BY over the source's current state. */
  private def assertParity(store: TableStore, mv: String,
                           srcTable: String): Unit = {
    val got = MaterializedView.read(store, mv)
      .select(col("g"), col("cnt"), col("sum_x"))
      .orderBy("g").collect().toSeq
    val want = store.read(srcTable)
      .groupBy("g").agg(count(lit(1)).as("cnt"), sum("x").as("sum_x"))
      .orderBy("g").collect().toSeq
    assert(got == want, s"MV diverged from recompute:\n got  $got\n want $want")
  }

  test("create + refresh fold appends AND MoR deletes from the feed; net-zero groups vanish") {
    val store = freshStore()
    store.create("t", src((1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)))
    val v0 = MaterializedView.create(store, "m", "t", Seq("g"), Seq("x"))
    assert(v0 == 0L)
    assertParity(store, "m", "t")
    // append a new group + more of an existing one
    store.append("t", src((4, "b", 4.0), (5, "c", 5.0)))
    // MoR equality delete: kill group a entirely (net-zero) and one b row
    store.appendWithDeletes("t", src().limit(0),
      deleteKeys = Seq(1L, 2L, 3L).toDF("id"))
    val bound = MaterializedView.refresh(store, "m")
    assert(bound == store.currentVersion("t").get)
    assertParity(store, "m", "t")
    // group a netted to zero and must be GONE, not cnt=0
    assert(!MaterializedView.read(store, "m").select("g").as[String]
      .collect().contains("a"))
  }

  test("refresh is O(changed data): watermark advances, replay no-ops, idle refresh is a no-op") {
    val store = freshStore()
    store.create("t", src((1, "a", 1.0)))
    MaterializedView.create(store, "m", "t", Seq("g"), Seq("x"))
    store.append("t", src((2, "b", 2.0)))
    val b1 = MaterializedView.refresh(store, "m")
    val mvV = store.currentVersion("m").get
    // nothing new: refresh returns the same bound and commits nothing
    assert(MaterializedView.refresh(store, "m") == b1)
    assert(store.currentVersion("m").get == mvV)
    assertParity(store, "m", "t")
  }

  test("compactPartials folds to one row per group and keeps the binding live") {
    val store = freshStore()
    store.create("t", src((1, "a", 1.0), (2, "b", 2.0)))
    MaterializedView.create(store, "m", "t", Seq("g"), Seq("x"))
    (1 to 3).foreach { i =>
      store.append("t", src((10L + i, "a", i.toDouble)))
      MaterializedView.refresh(store, "m")
    }
    val partialRows = store.read("m").count()
    assert(partialRows > 2, s"expected accumulated partials, got $partialRows")
    MaterializedView.compactPartials(store, "m")
    assert(store.read("m").count() == 2) // one row per surviving group
    assertParity(store, "m", "t")
    // the binding survived the fold: a post-compact source change
    // still refreshes incrementally from where the partials left off
    store.append("t", src((99, "c", 9.0)))
    MaterializedView.refresh(store, "m")
    assertParity(store, "m", "t")
  }

  test("neutral source rewrite (compact) advances the watermark through an empty feed") {
    val store = freshStore()
    store.create("t", src((1, "a", 1.0), (2, "a", 2.0)))
    MaterializedView.create(store, "m", "t", Seq("g"), Seq("x"))
    store.append("t", src((3, "b", 3.0)))
    store.compact("t") // content-neutral rewrite on the source
    val bound = MaterializedView.refresh(store, "m")
    assert(bound == store.currentVersion("t").get,
      "watermark must advance past the neutral rewrite")
    assertParity(store, "m", "t")
  }

  test("NULL measures: insert/delete pairs cancel, sum ignores them symmetrically") {
    val store = freshStore()
    store.create("t", Seq((1L, "a", Some(1.0)), (2L, "a", None),
      (3L, "b", None)).toDF("id", "g", "x"))
    MaterializedView.create(store, "m", "t", Seq("g"), Seq("x"))
    store.appendWithDeletes("t",
      Seq.empty[(Long, String, Option[Double])].toDF("id", "g", "x"),
      deleteKeys = Seq(2L).toDF("id"))
    MaterializedView.refresh(store, "m")
    val got = MaterializedView.read(store, "m")
      .select("g", "cnt", "sum_x").orderBy("g")
      .as[(String, Long, Option[Double])].collect().toSeq
    // group b survives with cnt=1 and a NULL sum (its only x is NULL)
    assert(got == Seq(("a", 1L, Some(1.0)), ("b", 1L, None)))
  }

  test("delete-and-reinsert in one source commit folds exactly once") {
    val store = freshStore()
    store.create("t", src((1, "a", 1.0), (2, "b", 2.0)))
    MaterializedView.create(store, "m", "t", Seq("g"), Seq("x"))
    // one atomic commit: delete id=1 and reinsert it with a new value
    store.appendWithDeletes("t", src((1, "a", 10.0)),
      deleteKeys = Seq(1L).toDF("id"))
    MaterializedView.refresh(store, "m")
    assertParity(store, "m", "t")
    val a = MaterializedView.read(store, "m").where(col("g") === "a")
      .select("cnt", "sum_x").as[(Long, Double)].collect().head
    assert(a == ((1L, 10.0)))
  }

  test("a WHERE-filtered view admits the same rows on insert and delete") {
    val store = freshStore()
    store.create("t", src((1, "a", 1.0), (2, "a", 9.0), (3, "b", 7.0)))
    MaterializedView.create(store, "m", "t", Seq("g"), Seq("x"),
      filter = Some("x > 5"))
    // only (2,a,9) and (3,b,7) were admitted
    assert(MaterializedView.read(store, "m").select("g", "cnt", "sum_x")
      .orderBy("g").as[(String, Long, Double)].collect().toSeq ==
      Seq(("a", 1L, 9.0), ("b", 1L, 7.0)))
    // delete an admitted row and a never-admitted row in one commit:
    // only the admitted one may subtract
    store.appendWithDeletes("t", src((4, "b", 6.0)),
      deleteKeys = Seq(1L, 2L).toDF("id"))
    MaterializedView.refresh(store, "m")
    val got = MaterializedView.read(store, "m").select("g", "cnt", "sum_x")
      .orderBy("g").as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("b", 2L, 13.0)), s"got $got")
  }

  test("min/max maintain incrementally on inserts; a delete repairs exactly the touched groups") {
    val store = freshStore()
    store.create("t", src((1, "a", 5.0), (2, "a", 9.0), (3, "b", 3.0)))
    MaterializedView.create(store, "m", "t", Seq("g"), Seq("x"),
      minCols = Seq("x"), maxCols = Seq("x"))
    def state() = MaterializedView.read(store, "m")
      .select("g", "cnt", "sum_x", "min_x", "max_x").orderBy("g")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(state() == Seq(("a", 2L, 14.0, 5.0, 9.0), ("b", 1L, 3.0, 3.0, 3.0)))
    // insert-only refresh: extrema widen without touching the source
    store.append("t", src((4, "a", 1.0), (5, "b", 8.0)))
    MaterializedView.refresh(store, "m")
    assert(state() == Seq(("a", 3L, 15.0, 1.0, 9.0), ("b", 2L, 11.0, 3.0, 8.0)))
    // delete group a's MAX (9.0): the old extremum must not resurface
    // from pre-delete partial rows — the recompute + reset fence
    store.appendWithDeletes("t", src().limit(0),
      deleteKeys = Seq(2L).toDF("id"))
    MaterializedView.refresh(store, "m")
    assert(state() == Seq(("a", 2L, 6.0, 1.0, 5.0), ("b", 2L, 11.0, 3.0, 8.0)))
    // compaction preserves the repaired extrema and later inserts fold
    MaterializedView.compactPartials(store, "m")
    assert(state() == Seq(("a", 2L, 6.0, 1.0, 5.0), ("b", 2L, 11.0, 3.0, 8.0)))
    store.append("t", src((6, "a", 7.0)))
    MaterializedView.refresh(store, "m")
    assert(state() == Seq(("a", 3L, 13.0, 1.0, 7.0), ("b", 2L, 11.0, 3.0, 8.0)))
  }

  test("a delete-and-reinsert of the extremum in one commit repairs to the reinserted value") {
    val store = freshStore()
    store.create("t", src((1, "a", 5.0), (2, "a", 9.0)))
    MaterializedView.create(store, "m", "t", Seq("g"), Seq("x"),
      maxCols = Seq("x"))
    // one atomic commit: the max row leaves and a lower one arrives
    store.appendWithDeletes("t", src((3, "a", 6.0)),
      deleteKeys = Seq(2L).toDF("id"))
    MaterializedView.refresh(store, "m")
    val got = MaterializedView.read(store, "m")
      .select("g", "cnt", "max_x").as[(String, Long, Double)]
      .collect().toSeq
    assert(got == Seq(("a", 2L, 6.0)))
  }

  test("avg divides by the NON-NULL count and survives deletes of null and non-null rows") {
    val store = freshStore()
    store.create("t", Seq((1L, "a", Some(4.0)), (2L, "a", None),
      (3L, "a", Some(8.0)), (4L, "b", None)).toDF("id", "g", "x"))
    MaterializedView.create(store, "m", "t", Seq("g"), Nil,
      avgCols = Seq("x"))
    def state() = MaterializedView.read(store, "m")
      .select("g", "cnt", "avg_x").orderBy("g")
      .as[(String, Long, Option[Double])].collect().toSeq
    // avg over (4, NULL, 8) = 6, not 4 — divide by 2, not cnt=3;
    // group b's only x is NULL -> avg NULL like SQL
    assert(state() == Seq(("a", 3L, Some(6.0)), ("b", 1L, None)))
    // delete one null row and one non-null row: numerator and
    // denominator both adjust through the signed partials
    store.appendWithDeletes("t",
      Seq.empty[(Long, String, Option[Double])].toDF("id", "g", "x"),
      deleteKeys = Seq(2L, 3L).toDF("id"))
    MaterializedView.refresh(store, "m")
    assert(state() == Seq(("a", 1L, Some(4.0)), ("b", 1L, None)))
    MaterializedView.compactPartials(store, "m")
    assert(state() == Seq(("a", 1L, Some(4.0)), ("b", 1L, None)))
  }

  test("a full OVERWRITE of the source (rewrite commit) refreshes through the bag diff") {
    val store = freshStore()
    store.create("t", src((1, "a", 1.0), (2, "a", 9.0), (3, "b", 3.0)))
    MaterializedView.create(store, "m", "t", Seq("g"), Seq("x"),
      minCols = Seq("x"), maxCols = Seq("x"))
    // a rewrite commit (no row-level lineage): the feed falls back to
    // the two-sided bag diff, which the refresh must fold exactly —
    // including the min/max repair for the groups the diff deletes from
    store.overwrite("t", src((4, "a", 5.0), (5, "c", 7.0)))
    MaterializedView.refresh(store, "m")
    val got = MaterializedView.read(store, "m")
      .select("g", "cnt", "sum_x", "min_x", "max_x").orderBy("g")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(("a", 1L, 5.0, 5.0, 5.0), ("c", 1L, 7.0, 7.0, 7.0)),
      s"got $got")
  }

  test("refresh on a non-MV table fails loudly") {
    val store = freshStore()
    store.create("plain", src((1, "a", 1.0)))
    intercept[IllegalStateException] {
      MaterializedView.refresh(store, "plain")
    }
  }
}
