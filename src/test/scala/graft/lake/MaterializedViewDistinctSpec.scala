package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate distinct measures in materialized views: per group a
  * KMV sketch (k smallest distinct md5-derived hashes) stored like the
  * other partials — inserts merge incrementally (k-min of union),
  * deletes repair the touched groups behind the epoch fence — with a
  * LOUD `approx_distinct_<c>` read column. The governing invariant:
  * incremental maintenance is SKETCH-EXACT — refresh produces bit-for-
  * bit the sketch a from-scratch rebuild would, so the estimate is
  * deterministic and engine-replayable (and EXACT below k). */
class MaterializedViewDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore() = new TableStore(spark, tmpDir("mvd"))

  private def src(rows: (Long, String, Long)*): DataFrame =
    rows.toDF("id", "g", "u")

  /** refresh ≡ rebuild, sketch-exactly: the maintained view's
    * estimates equal a from-scratch view over the source's current
    * state, bit for bit. */
  private def assertSketchParity(store: TableStore, mv: String,
                                 srcTable: String, k: Int = 64): Unit = {
    val got = MaterializedView.read(store, mv)
      .select("g", "cnt", "approx_distinct_u")
      .orderBy("g").collect().toSeq
    val rebuildName = mv + "__rebuild_probe"
    MaterializedView.create(store, rebuildName, srcTable, Seq("g"), Nil,
      distinctCols = Seq("u"), kmvK = k)
    val want = MaterializedView.read(store, rebuildName)
      .select("g", "cnt", "approx_distinct_u")
      .orderBy("g").collect().toSeq
    store.drop(rebuildName); store.drop(rebuildName + "__def")
    assert(got == want,
      s"maintained sketch diverged from rebuild:\n got  $got\n want $want")
  }

  test("estimates are EXACT below k and match count(DISTINCT) on inserts") {
    val store = freshStore()
    store.create("t", src((1, "a", 10), (2, "a", 10), (3, "a", 20),
      (4, "b", 30)))
    MaterializedView.create(store, "m", "t", Seq("g"), Nil,
      distinctCols = Seq("u"))
    val got = MaterializedView.read(store, "m")
      .select("g", "approx_distinct_u").as[(String, Double)]
      .collect().toMap
    assert(got == Map("a" -> 2.0, "b" -> 1.0))
    // incremental append: new distinct value + duplicate of an old one
    store.append("t", src((5, "a", 20), (6, "a", 40), (7, "b", 30)))
    MaterializedView.refresh(store, "m")
    val got2 = MaterializedView.read(store, "m")
      .select("g", "approx_distinct_u").as[(String, Double)]
      .collect().toMap
    assert(got2 == Map("a" -> 3.0, "b" -> 1.0))
    assertSketchParity(store, "m", "t")
  }

  test("a delete repairs exactly the touched group's sketch (fence retires old evidence)") {
    val store = freshStore()
    store.create("t", src((1, "a", 10), (2, "a", 20), (3, "b", 30),
      (4, "b", 40)))
    MaterializedView.create(store, "m", "t", Seq("g"), Nil,
      distinctCols = Seq("u"))
    // delete the only row carrying u=20: a's distinct drops to 1 —
    // un-subtractable from a sketch, must repair via recompute
    store.appendWithDeletes("t", src().limit(0),
      deleteKeys = Seq(2L).toDF("id"))
    MaterializedView.refresh(store, "m")
    val got = MaterializedView.read(store, "m")
      .select("g", "approx_distinct_u").as[(String, Double)]
      .collect().toMap
    assert(got == Map("a" -> 1.0, "b" -> 2.0),
      s"deleted distinct value must not linger in the sketch: $got")
    assertSketchParity(store, "m", "t")
    // delete one of two rows sharing u=30: b's distinct count is
    // unchanged (the value survives in row 4... wait, u=30 only on row 3)
    store.appendWithDeletes("t", src().limit(0),
      deleteKeys = Seq(3L).toDF("id"))
    MaterializedView.refresh(store, "m")
    assertSketchParity(store, "m", "t")
  }

  test("delete + reinsert across refreshes converges to rebuild (epoch ordering)") {
    val store = freshStore()
    store.create("t", (1L to 40L).map(i => (i, "g" + (i % 2), i % 7))
      .toDF("id", "g", "u"))
    MaterializedView.create(store, "m", "t", Seq("g"), Nil,
      distinctCols = Seq("u"))
    // refresh 1: delete a value class entirely from one group
    store.appendWithDeletes("t", src().limit(0),
      deleteKeys = (1L to 40L).filter(i => i % 2 == 0 && i % 7 == 3)
        .toDF("id"))
    MaterializedView.refresh(store, "m")
    assertSketchParity(store, "m", "t")
    // refresh 2: reinsert the value — the post-fence insert must count
    store.append("t", Seq((100L, "g0", 3L)).toDF("id", "g", "u"))
    MaterializedView.refresh(store, "m")
    assertSketchParity(store, "m", "t")
  }

  test("estimate matches Sketches.kmvDistinct past k, and compaction preserves it") {
    val store = freshStore()
    // 300 distinct values per group with k=16 -> a genuine estimate
    val k = 16
    store.create("t", (1L to 600L).map(i => (i, "g" + (i % 2), i))
      .toDF("id", "g", "u"))
    MaterializedView.create(store, "m", "t", Seq("g"), Nil,
      distinctCols = Seq("u"), kmvK = k)
    store.append("t", (601L to 700L).map(i => (i, "g" + (i % 2), i))
      .toDF("id", "g", "u"))
    MaterializedView.refresh(store, "m")
    val got = MaterializedView.read(store, "m")
      .select("g", "approx_distinct_u").as[(String, Double)]
      .collect().toMap
    val want = graft.ops.Sketches
      .kmvDistinct(store.read("t"), Seq("g"), "u", k)
      .as[(String, Double)].collect().toMap
    assert(got == want,
      s"view estimate must equal the direct KMV sketch:\n $got\n $want")
    // estimates are estimates: KMV stddev ~ 1/sqrt(k-2) ≈ 27% at
    // k=16, so allow ~2.5 sigma around the true 350
    got.values.foreach(v => assert(math.abs(v - 350.0) / 350.0 < 0.7,
      s"estimate $v implausibly far from 350"))
    // compaction folds partials but must not change any estimate
    MaterializedView.compactPartials(store, "m")
    val got2 = MaterializedView.read(store, "m")
      .select("g", "approx_distinct_u").as[(String, Double)]
      .collect().toMap
    assert(got2 == got, "compaction changed the sketch estimate")
    // and refresh still works after compaction
    store.append("t", Seq((701L, "g1", 701L)).toDF("id", "g", "u"))
    MaterializedView.refresh(store, "m")
    assertSketchParity(store, "m", "t", k)
  }

  test("approx_count_distinct rewrite serves from the view ONLY behind the opt-in") {
    val store = freshStore()
    val k = 16
    store.create("t", (1L to 400L).map(i => (i, "g" + (i % 2), i % 90))
      .toDF("id", "g", "u"))
    GraftSql.execute(spark, store,
      """CREATE MATERIALIZED VIEW adr_mv AS
        |SELECT g, count(*), approx_count_distinct(u)
        |FROM t GROUP BY g""".stripMargin)
    val q = "SELECT g, approx_count_distinct(u) AS du FROM t GROUP BY g"
    // default (opt-in OFF): the statement runs DIRECT — Spark's HLL
    val before = MvRewrite.hits.get()
    GraftSql.execute(spark, store, q).collect()
    assert(MvRewrite.hits.get() == before,
      "approx_count_distinct must not serve from the view without opt-in")
    try {
      spark.conf.set("spark.graft.mv.rewrite.approxDistinct", "true")
      val served = GraftSql.execute(spark, store, q)
        .as[(String, Long)].collect().toMap
      assert(MvRewrite.hits.get() == before + 1,
        "opted-in approx_count_distinct must serve from the view")
      // the served values are the view's own KMV estimates (long-cast)
      val want = MaterializedView.read(store, "adr_mv")
        .select("g", "approx_distinct_u").as[(String, Double)]
        .collect().toMap.map { case (g, d) => g -> math.round(d) }
      assert(served == want, s"served $served != view estimate $want")
    } finally spark.conf.unset("spark.graft.mv.rewrite.approxDistinct")
  }

  test("a NULL group key keeps fence, extremum repair and sketch through deletes") {
    // SQL GROUP BY treats NULL keys as one real group; the internal
    // fence/repair/sketch joins must be NULL-SAFE or that group's
    // evidence silently detaches (the fence inner join would drop the
    // group from reads outright)
    val store = freshStore()
    store.create("t", Seq(
      (1L, Option("a"), 10L, 5.0), (2L, Option("a"), 20L, 7.0),
      (3L, Option.empty[String], 30L, 9.0),
      (4L, Option.empty[String], 40L, 1.0),
      (5L, Option.empty[String], 30L, 3.0))
      .toDF("id", "g", "u", "x"))
    MaterializedView.create(store, "m", "t", Seq("g"), Nil,
      minCols = Seq("x"), maxCols = Seq("x"), distinctCols = Seq("u"))
    val got0 = MaterializedView.read(store, "m")
      .select("g", "cnt", "min_x", "max_x", "approx_distinct_u")
      .collect().map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got0(None) == ((3L, 1.0, 9.0, 2.0)),
      s"null group must exist with its own aggregates: $got0")
    // delete the null group's max AND the only row carrying u=40
    store.appendWithDeletes("t", spark.emptyDataset[(Long, String, Long, Double)]
      .toDF("id", "g", "u", "x"), deleteKeys = Seq(3L, 4L).toDF("id"))
    MaterializedView.refresh(store, "m")
    val got1 = MaterializedView.read(store, "m")
      .select("g", "cnt", "min_x", "max_x", "approx_distinct_u")
      .collect().map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got1(None) == ((1L, 3.0, 3.0, 1.0)),
      s"null group's repair must land (extrema recomputed, deleted " +
        s"distinct value gone): $got1")
    assert(got1(Some("a")) == ((2L, 5.0, 7.0, 2.0)))
  }

  test("NULL distinct values are ignored, like SQL count(DISTINCT)") {
    val store = freshStore()
    store.create("t", Seq((1L, "a", Some(10L)), (2L, "a", None),
      (3L, "b", Option.empty[Long])).toDF("id", "g", "u"))
    MaterializedView.create(store, "m", "t", Seq("g"), Nil,
      distinctCols = Seq("u"))
    val got = MaterializedView.read(store, "m")
      .select("g", "cnt", "approx_distinct_u").as[(String, Long, Double)]
      .collect().toSeq.sortBy(_._1)
    assert(got == Seq(("a", 2L, 1.0), ("b", 1L, 0.0)),
      s"all-NULL group must read 0 distinct, not NULL/absent: $got")
  }
}
