package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The MV rewrite contract ([[MvRewrite]]): an aggregate SELECT
  * through the SQL front door is served from a FRESH bound
  * materialized view whenever the view subsumes it — and NEVER
  * otherwise. Every leg asserts both the routing (the hit counter)
  * and the answer (parity with direct execution over the source). */
class MvRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore() = new TableStore(spark, tmpDir("mvrw"))

  private def rows(n: Int): DataFrame =
    (1 to n).map { i =>
      (i.toLong, "g" + (i % 3), "h" + (i % 2),
        if (i % 7 == 0) null else java.lang.Double.valueOf(i.toDouble))
    }.toDF("id", "g", "h", "x")

  /** Run `sql` through the front door, return (result, servedFromMv). */
  private def run(store: TableStore, sql: String): (Seq[Row], Boolean) = {
    val before = MvRewrite.hits.get()
    val got = GraftSql.execute(spark, store, sql)
    val sorted = got.orderBy(got.columns.map(col): _*).collect().toSeq
    (sorted, MvRewrite.hits.get() > before)
  }

  /** Direct execution of the same SQL with rewriting disabled. */
  private def direct(store: TableStore, sql: String): Seq[Row] = {
    spark.conf.set(MvRewrite.EnabledKey, "false")
    try run(store, sql)._1
    finally spark.conf.set(MvRewrite.EnabledKey, "true")
  }

  private def setup(): TableStore = {
    val store = freshStore()
    store.create("t", rows(40))
    MaterializedView.create(store, "mv_t", "t", Seq("g", "h"), Seq("x"),
      minCols = Seq("x"), maxCols = Seq("x"), avgCols = Seq("x"))
    // exercise the fold paths the rewrite must see through: an append,
    // a MoR delete, then a refresh that makes the view fresh again
    store.append("t", rows(60).where(col("id") > 40))
    store.appendWithDeletes("t", rows(0).limit(0),
      deleteKeys = Seq(3L, 9L, 21L).toDF("id"))
    MaterializedView.refresh(store, "mv_t")
    store
  }

  private def assertServed(store: TableStore, sql: String): Unit = {
    val (got, served) = run(store, sql)
    assert(served, s"expected MV rewrite to serve: $sql")
    assert(MvRewrite.lastServed.contains("mv_t"))
    assert(got == direct(store, sql),
      s"rewritten answer diverged from direct for: $sql")
  }

  private def assertDirect(store: TableStore, sql: String): Unit = {
    val (got, served) = run(store, sql)
    assert(!served, s"expected NO rewrite for: $sql")
    assert(got == direct(store, sql))
  }

  test("exact group match: every measure family served from the view") {
    val store = setup()
    assertServed(store,
      """SELECT g, h, count(*) AS n, count(x) AS nx, sum(x) AS sx,
        |  avg(x) AS ax, min(x) AS mnx, max(x) AS mxx
        |FROM t GROUP BY g, h""".stripMargin)
  }

  test("group-subset roll-up re-aggregates the view exactly (incl. NULL measures)") {
    val store = setup()
    assertServed(store,
      "SELECT g, count(*) AS n, count(x) AS nx, sum(x) AS sx, avg(x) AS ax, " +
        "min(x) AS mnx, max(x) AS mxx FROM t GROUP BY g")
    // coarsest: single group column the view also groups on
    assertServed(store, "SELECT h, sum(x) AS sx FROM t GROUP BY h")
  }

  test("residual WHERE on view group columns filters view rows; ordinals resolve") {
    val store = setup()
    assertServed(store,
      "SELECT g, sum(x) AS sx FROM t WHERE h = 'h1' GROUP BY g")
    assertServed(store,
      "SELECT g, count(*) AS n FROM t WHERE h = 'h0' AND g <> 'g2' GROUP BY 1")
  }

  test("filtered view: only queries carrying the view's conjunct rewrite") {
    val store = freshStore()
    store.create("t", rows(40))
    MaterializedView.create(store, "mv_t", "t", Seq("g", "h"), Seq("x"),
      filter = Some("x > 2"))
    assertServed(store,
      "SELECT g, sum(x) AS sx FROM t WHERE x > 2 GROUP BY g")
    assertServed(store,
      "SELECT g, sum(x) AS sx FROM t WHERE x > 2 AND h = 'h1' GROUP BY g")
    // missing the view's predicate → the view admitted fewer rows
    assertDirect(store, "SELECT g, sum(x) AS sx FROM t GROUP BY g")
    // different predicate → not subsumed
    assertDirect(store, "SELECT g, sum(x) AS sx FROM t WHERE x > 3 GROUP BY g")
  }

  test("stale view never serves; refresh restores the rewrite") {
    val store = setup()
    store.append("t", rows(70).where(col("id") > 60))
    // the view is behind the source now — answering from it would
    // serve the past; the query must run direct and see the new rows
    assertDirect(store, "SELECT g, count(*) AS n FROM t GROUP BY g")
    MaterializedView.refresh(store, "mv_t")
    assertServed(store, "SELECT g, count(*) AS n FROM t GROUP BY g")
  }

  test("untranslatable shapes fall through to direct execution") {
    val store = setup()
    // residual predicate on a NON-group column
    assertDirect(store, "SELECT g, count(*) AS n FROM t WHERE x > 5 GROUP BY g")
    // grouping by a column the view does not group on
    assertDirect(store, "SELECT id, count(*) AS n FROM t GROUP BY id")
    // DISTINCT aggregate over a NON-group column (a measure): the
    // view stores partials for x, never its distinct values
    assertDirect(store, "SELECT g, count(DISTINCT x) AS n FROM t GROUP BY g")
    // distinct SUM is never servable
    assertDirect(store, "SELECT g, sum(DISTINCT x) AS sx FROM t GROUP BY g")
    // measure over a column the view does not maintain
    assertDirect(store, "SELECT g, sum(id) AS si FROM t GROUP BY g")
    // expression grouping
    assertDirect(store, "SELECT upper(g) AS ug, count(*) AS n FROM t GROUP BY upper(g)")
    // non-aggregate SELECT never consults the registry
    assertDirect(store, "SELECT * FROM t WHERE id = 1")
  }

  test("schema guard abstains on type-promotion mismatch (decimal measures)") {
    val store = freshStore()
    store.create("td", rows(20)
      .withColumn("x", col("x").cast("decimal(18,4)")))
    MaterializedView.create(store, "mv_td", "td", Seq("g"), Seq("x"))
    // direct sum(decimal(18,4)) widens to decimal(28,4); the stored
    // signed partial widened further — the guard must refuse to serve
    // a differently-typed column and fall back to direct execution
    assertDirect(store, "SELECT g, sum(x) AS sx FROM td GROUP BY g")
  }

  test("config kill-switch disables the rewrite") {
    val store = setup()
    spark.conf.set(MvRewrite.EnabledKey, "false")
    try {
      val (got, served) = run(store, "SELECT g, count(*) AS n FROM t GROUP BY g")
      assert(!served)
      assert(got.nonEmpty)
    } finally spark.conf.set(MvRewrite.EnabledKey, "true")
  }

  test("case-insensitive matching: uppercase SQL still rewrites") {
    val store = setup()
    assertServed(store,
      "SELECT G, SUM(X) AS sx FROM T WHERE H = 'h1' GROUP BY G")
  }

  test("global (ungrouped) aggregates are served, including over an empty-admission view") {
    val store = setup()
    assertServed(store,
      "SELECT count(*) AS n, count(x) AS nx, sum(x) AS sx, avg(x) AS ax, " +
        "min(x) AS mnx, max(x) AS mxx FROM t")
    // residual on a group column still applies before the global fold
    assertServed(store, "SELECT count(*) AS n, sum(x) AS sx FROM t WHERE g = 'g1'")
    // a residual admitting NO view rows: count 0 (one row), sum NULL
    val (got, served) = run(store,
      "SELECT count(*) AS n, sum(x) AS sx FROM t WHERE g = 'nope'")
    assert(served)
    assert(got == direct(store, "SELECT count(*) AS n, sum(x) AS sx FROM t WHERE g = 'nope'"))
    assert(got.head.getLong(0) == 0L && got.head.isNullAt(1))
  }

  test("HAVING translates aggregate refs (aliased, unaliased, hidden measures)") {
    val store = setup()
    assertServed(store,
      "SELECT g, count(*) AS n FROM t GROUP BY g HAVING count(*) > 17")
    // HAVING over a measure NOT in the select list → hidden column
    assertServed(store,
      "SELECT g, count(*) AS n FROM t GROUP BY g HAVING sum(x) > 100 AND avg(x) > 1")
    // HAVING referencing the output alias
    assertServed(store,
      "SELECT g, count(*) AS n FROM t GROUP BY g HAVING n > 17")
    // HAVING over an unmaintained measure falls through
    assertDirect(store,
      "SELECT g, count(*) AS n FROM t GROUP BY g HAVING sum(id) > 10")
  }

  test("ORDER BY and LIMIT ride the rewrite (top-k over the view)") {
    val store = setup()
    val sql = "SELECT g, sum(x) AS sx FROM t GROUP BY g ORDER BY sx DESC LIMIT 2"
    val before = MvRewrite.hits.get()
    val got = GraftSql.execute(spark, store, sql).collect().toSeq
    assert(MvRewrite.hits.get() > before, "expected top-k to be served")
    spark.conf.set(MvRewrite.EnabledKey, "false")
    val want = try GraftSql.execute(spark, store, sql).collect().toSeq
    finally spark.conf.set(MvRewrite.EnabledKey, "true")
    assert(got == want, s"top-k diverged: got $got want $want")
    // ordering by a measure not selected (hidden), mixed direction
    assertServed(store,
      "SELECT g, count(*) AS n FROM t GROUP BY g ORDER BY max(x) DESC, g ASC")
  }

  test("derived-group views serve queries that group by the same expression") {
    val store = freshStore()
    store.create("tv", (1 to 50).map(i => (i.toLong, i.toDouble))
      .toDF("id", "x"))
    MaterializedView.create(store, "bkt_mv", "tv", Seq("bucket"), Seq("x"),
      groupExprs = Seq("CAST(x / 10 AS INT)"))
    def served(sql: String): Unit = {
      val (got, wasServed) = run(store, sql)
      assert(wasServed, s"expected derived-group rewrite for: $sql")
      assert(MvRewrite.lastServed.contains("bkt_mv"))
      assert(got == direct(store, sql), s"diverged for: $sql")
    }
    served("SELECT CAST(x / 10 AS INT) AS bucket, count(*) AS n, " +
      "sum(x) AS sx FROM tv GROUP BY CAST(x / 10 AS INT)")
    // ordinal form + residual over the SAME derived expression
    served("SELECT CAST(x / 10 AS INT) AS b, sum(x) AS sx FROM tv " +
      "WHERE CAST(x / 10 AS INT) <> 2 GROUP BY 1")
    // global aggregate with a derived-expression residual
    served("SELECT count(*) AS n FROM tv WHERE CAST(x / 10 AS INT) = 1")
    // a DIFFERENT bucketing expression is not this view
    assertDirect(store,
      "SELECT CAST(x / 5 AS INT) AS b, count(*) AS n FROM tv GROUP BY 1")
  }

  test("a source column named like a derived key never leaks through the residual") {
    val store = freshStore()
    // tv2 has a REAL column `bucket` (unrelated values) AND the view
    // derives its own `bucket` from x — WHERE bucket = 1 must run
    // direct (over the source column), never filter view groups
    store.create("tv2", (1 to 40).map(i =>
      (i.toLong, i.toDouble, (i % 2).toLong)).toDF("id", "x", "bucket"))
    MaterializedView.create(store, "bkt2_mv", "tv2", Seq("bucket"), Seq("x"),
      groupExprs = Seq("CAST(x / 10 AS INT)"))
    assertDirect(store, "SELECT count(*) AS n, sum(x) AS sx FROM tv2 " +
      "WHERE bucket = 1")
  }

  private def setupJoin(): TableStore = {
    val store = freshStore()
    store.create("fct", (1 to 30).map(i =>
      (i.toLong, (i % 5).toLong, i.toDouble)).toDF("id", "k", "x"))
    store.create("dmn", (0 to 4).map(k =>
      (k.toLong, "s" + (k % 2), "r" + k)).toDF("k", "seg", "reg"))
    MaterializedView.createJoined(store, "j_mv", "fct", "dmn", Seq("k"),
      Seq("seg", "reg"), Seq("x"), avgCols = Seq("x"))
    store.append("fct", (31 to 40).map(i =>
      (i.toLong, (i % 5).toLong, i.toDouble)).toDF("id", "k", "x"))
    MaterializedView.refresh(store, "j_mv")
    store
  }

  private def assertServedBy(store: TableStore, mv: String,
                             sql: String): Unit = {
    val (got, served) = run(store, sql)
    assert(served, s"expected MV rewrite to serve: $sql")
    assert(MvRewrite.lastServed.contains(mv))
    assert(got == direct(store, sql),
      s"rewritten answer diverged from direct for: $sql")
  }

  test("join queries are served from a matching join view (group subset + residual)") {
    val store = setupJoin()
    assertServedBy(store, "j_mv",
      """SELECT seg, reg, count(*) AS n, sum(x) AS sx, avg(x) AS ax
        |FROM fct JOIN dmn USING (k) GROUP BY seg, reg""".stripMargin)
    // group subset + residual WHERE on a view group column
    assertServedBy(store, "j_mv",
      "SELECT seg, sum(x) AS sx FROM fct JOIN dmn USING (k) " +
        "WHERE reg <> 'r0' GROUP BY seg")
    // sides swapped: same inner join, still served
    assertServedBy(store, "j_mv",
      "SELECT seg, count(*) AS n FROM dmn JOIN fct USING (k) GROUP BY seg")
  }

  test("join views never serve single-table queries, and vice versa") {
    val store = setupJoin()
    // single-table aggregate over the fact: join multiplicity differs
    assertDirect(store, "SELECT k, count(*) AS n FROM fct GROUP BY k")
    // a DIFFERENT join (other using column) is not the view's join
    store.create("dmn2", (0 to 4).map(k =>
      (k.toLong, "z" + k)).toDF("k", "seg2"))
    assertDirect(store,
      "SELECT seg2, count(*) AS n FROM fct JOIN dmn2 USING (k) GROUP BY seg2")
    // stale join view (dim moved) does not serve until refreshed
    store.appendWithDeletes("dmn", Seq((0L, "s9", "r9")).toDF("k", "seg", "reg"),
      deleteKeys = Seq(0L).toDF("k"))
    assertDirect(store,
      "SELECT seg, count(*) AS n FROM fct JOIN dmn USING (k) GROUP BY seg")
    MaterializedView.refresh(store, "j_mv")
    assertServedBy(store, "j_mv",
      "SELECT seg, count(*) AS n FROM fct JOIN dmn USING (k) GROUP BY seg")
  }

  test("count(DISTINCT key) over identity group columns is served exactly") {
    val store = setup()
    // h is a view group column: distinct h per g counts surviving
    // view-group combos — served, and exact across the MoR deletes
    assertServed(store,
      "SELECT g, count(DISTINCT h) AS dh, count(*) AS n FROM t GROUP BY g")
    // global distinct over a group column
    assertServed(store, "SELECT count(DISTINCT g) AS dg FROM t")
    // with a residual on the other group column
    assertServed(store,
      "SELECT g, count(DISTINCT h) AS dh FROM t WHERE h <> 'h9' GROUP BY g")
    // derived-key views must NOT serve count(DISTINCT <derived name>):
    // here the source holds an UNRELATED column literally named b2 —
    // serving distinct-b2 from the view's derived key would be wrong
    val s2 = freshStore()
    s2.create("tv", (1 to 20).map(i => (i.toLong, i % 4, i * 7, i * 1.0))
      .toDF("id", "bucket", "b2", "x"))
    MaterializedView.create(s2, "mv_tv", "tv", Seq("b2"), Seq("x"),
      groupExprs = Seq("bucket % 2"))
    val (got, served) = run(s2, "SELECT count(DISTINCT b2) AS db FROM tv")
    assert(!served, "derived-key distinct must not serve")
    assert(got == direct(s2, "SELECT count(DISTINCT b2) AS db FROM tv"))
  }

  test("ON equi-join spelling is served from a USING join view (and aliased)") {
    val store = setupJoin()
    assertServedBy(store, "j_mv",
      """SELECT seg, count(*) AS n, sum(x) AS sx
        |FROM fct JOIN dmn ON fct.k = dmn.k GROUP BY seg""".stripMargin)
    // table aliases + qualified columns elsewhere in the query
    assertServedBy(store, "j_mv",
      """SELECT d.seg AS seg, count(*) AS n
        |FROM fct f JOIN dmn d ON f.k = d.k
        |WHERE d.reg <> 'r0' GROUP BY d.seg""".stripMargin)
    // an ON condition that is NOT a using-equivalence runs direct
    assertDirect(store,
      """SELECT seg, count(*) AS n
        |FROM fct f JOIN dmn d ON f.k = d.k AND f.x > 3
        |GROUP BY seg""".stripMargin)
    // a qualifier NOT naming a FROM table never strips: the invalid
    // reference must surface as the analyzer's error, never get
    // silently "fixed" into a view column by the rewrite
    val before = MvRewrite.hits.get()
    intercept[org.apache.spark.sql.AnalysisException] {
      GraftSql.execute(spark, store,
        "SELECT other.seg AS s2, count(*) AS n FROM fct JOIN dmn " +
          "ON fct.k = dmn.k GROUP BY other.seg").collect()
    }
    assert(MvRewrite.hits.get() == before)
  }

  test("3-table star views serve star queries in any join order") {
    val store = freshStore()
    store.create("f3", (1 to 40).map(i =>
      (i.toLong, (i % 5).toLong, (i % 3).toLong, i.toDouble))
      .toDF("id", "k1", "k2", "x"))
    store.create("d31", (0 to 4).map(k => (k.toLong, "s" + (k % 2)))
      .toDF("k1", "seg"))
    store.create("d32", (0 to 2).map(k => (k.toLong, "r" + k))
      .toDF("k2", "reg"))
    MaterializedView.createStar(store, "star_mv", "f3",
      Seq("d31" -> Seq("k1"), "d32" -> Seq("k2")),
      Seq("seg", "reg"), Seq("x"))
    // both sides move; one refresh folds everything
    store.append("f3", Seq((100L, 1L, 1L, 9.0)).toDF("id", "k1", "k2", "x"))
    store.appendWithDeletes("d31", Seq((0L, "s9")).toDF("k1", "seg"),
      deleteKeys = Seq(0L).toDF("k1"))
    MaterializedView.refresh(store, "star_mv")
    assertServedBy(store, "star_mv",
      """SELECT seg, reg, count(*) AS n, sum(x) AS sx
        |FROM f3 JOIN d31 USING (k1) JOIN d32 USING (k2)
        |GROUP BY seg, reg""".stripMargin)
    // dims in the other order + group subset + ON spelling
    assertServedBy(store, "star_mv",
      """SELECT seg, sum(x) AS sx
        |FROM f3 JOIN d32 ON f3.k2 = d32.k2 JOIN d31 ON f3.k1 = d31.k1
        |GROUP BY seg""".stripMargin)
    // a 2-table subset of the star is a DIFFERENT aggregate — direct
    assertDirect(store,
      "SELECT seg, count(*) AS n FROM f3 JOIN d31 USING (k1) GROUP BY seg")
  }

  test("rewrite overhead: one direct analysis per statement, defs cached by version") {
    val store = setup()
    // widen the candidate pool: several more views over the same source
    MaterializedView.create(store, "mv_g", "t", Seq("g"), Seq("x"))
    MaterializedView.create(store, "mv_h", "t", Seq("h"), Seq("x"))
    MaterializedView.create(store, "mv_gid", "t", Seq("g", "id"), Seq("x"))
    val sql = "SELECT g, sum(x) AS sx FROM t GROUP BY g"
    run(store, sql) // warm the def cache
    MetaMetrics.reset()
    val (_, served) = run(store, sql)
    assert(served)
    assert(MetaMetrics.mvDirectAnalyses.get() == 1,
      s"expected ONE direct-plan analysis for the whole candidate set, " +
        s"got ${MetaMetrics.mvDirectAnalyses.get()}")
    assert(MetaMetrics.mvDefLoads.get() == 0,
      "defs must answer from the version-keyed cache, not a collect " +
        s"job per view (got ${MetaMetrics.mvDefLoads.get()} loads)")
    // a structurally matching but unservable statement (measure not
    // stored by any view) never analyzes the direct plan inside the
    // rewrite — it just falls through to direct execution
    MetaMetrics.reset()
    val (_, served2) =
      run(store, "SELECT g, sum(id) AS si FROM t GROUP BY g")
    assert(!served2)
    assert(MetaMetrics.mvDirectAnalyses.get() == 0,
      "an unservable statement must not pay the schema-guard analysis")
    // re-CREATE invalidates the cache through the version key: the
    // redefined view serves the new definition, never the cached old
    GraftSql.execute(spark, store, "DROP MATERIALIZED VIEW mv_g")
    MaterializedView.create(store, "mv_g", "t", Seq("g"), Seq("id"))
    val (got, servedNew) =
      run(store, "SELECT g, sum(id) AS si FROM t GROUP BY g")
    assert(servedNew && got == direct(store,
      "SELECT g, sum(id) AS si FROM t GROUP BY g"))
  }
}
