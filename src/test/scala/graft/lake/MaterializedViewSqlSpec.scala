package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The SQL surface of incremental materialized views: CREATE/REFRESH/
  * OPTIMIZE MATERIALIZED VIEW through the front door, and SELECTs
  * that serve the CONSOLIDATED view (never the stored partials). */
class MaterializedViewSqlSpec extends SparkSpec {
  import spark.implicits._

  test("CREATE / REFRESH / OPTIMIZE MATERIALIZED VIEW round-trip; SELECT serves consolidated rows") {
    val store = new TableStore(spark, tmpDir("mvsql"))
    store.create("sales", Seq((1L, "a", 10.0), (2L, "a", 5.0),
      (3L, "b", 2.0)).toDF("id", "g", "x"))
    val created = GraftSql.execute(spark, store,
      "CREATE MATERIALIZED VIEW sales_mv AS " +
        "SELECT g, count(*), sum(x), min(x), max(x) FROM sales GROUP BY g")
    assert(created.select("bound_version").as[Long].head() == 0L)
    store.append("sales", Seq((4L, "b", 8.0), (5L, "c", 1.0))
      .toDF("id", "g", "x"))
    GraftSql.execute(spark, store, "REFRESH MATERIALIZED VIEW sales_mv")
    // SELECT over the MV name = consolidated groups, not partials
    val got = GraftSql.execute(spark, store,
      "SELECT g, cnt, sum_x, min_x, max_x FROM sales_mv ORDER BY g")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(("a", 2L, 15.0, 5.0, 10.0),
      ("b", 2L, 10.0, 2.0, 8.0), ("c", 1L, 1.0, 1.0, 1.0)))
    // OPTIMIZE folds the partial rows; the SELECT is unchanged
    GraftSql.execute(spark, store, "OPTIMIZE MATERIALIZED VIEW sales_mv")
    assert(store.read("sales_mv").count() == 3)
    val after = GraftSql.execute(spark, store,
      "SELECT g, cnt, sum_x, min_x, max_x FROM sales_mv ORDER BY g")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(after == got)
  }

  test("CREATE MATERIALIZED VIEW with a WHERE folds only admitted rows") {
    val store = new TableStore(spark, tmpDir("mvsqlw"))
    store.create("w", Seq((1L, "a", 2.0), (2L, "a", 9.0), (3L, "b", 7.0))
      .toDF("id", "g", "x"))
    GraftSql.execute(spark, store,
      "CREATE MATERIALIZED VIEW w_mv AS " +
        "SELECT g, count(*), sum(x) FROM w WHERE x > 5 GROUP BY g")
    GraftSql.execute(spark, store, "INSERT INTO w VALUES (4, 'b', 1.0)")
    GraftSql.execute(spark, store, "REFRESH MATERIALIZED VIEW w_mv")
    val got = GraftSql.execute(spark, store,
      "SELECT g, cnt, sum_x FROM w_mv ORDER BY g")
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("a", 1L, 9.0), ("b", 1L, 7.0))) // x=1.0/2.0 never admitted
  }

  test("non-maintainable aggregates are rejected with a pointer to plain queries") {
    val store = new TableStore(spark, tmpDir("mvsql2"))
    store.create("s2", Seq((1L, "a", 1.0)).toDF("id", "g", "x"))
    val e = intercept[IllegalArgumentException] {
      GraftSql.execute(spark, store,
        "CREATE MATERIALIZED VIEW bad_mv AS " +
          "SELECT g, count(DISTINCT x) FROM s2 GROUP BY g")
    }
    assert(e.getMessage.contains("sum(col)"))
  }

  test("DESCRIBE MATERIALIZED VIEW reports binding and staleness without a scan") {
    val store = new TableStore(spark, tmpDir("mvdesc"))
    store.create("d1", Seq((1L, "a", 1.0)).toDF("id", "g", "x"))
    GraftSql.execute(spark, store,
      "CREATE MATERIALIZED VIEW d1_mv AS " +
        "SELECT g, count(*), sum(x), max(x) FROM d1 WHERE x > 0 GROUP BY g")
    store.append("d1", Seq((2L, "b", 2.0)).toDF("id", "g", "x"))
    store.append("d1", Seq((3L, "c", 3.0)).toDF("id", "g", "x"))
    val desc = GraftSql.execute(spark, store,
      "DESCRIBE MATERIALIZED VIEW d1_mv").collect().head
    assert(desc.getAs[String]("source") == "d1")
    assert(desc.getAs[String]("max_cols") == "x")
    assert(desc.getAs[String]("filter_sql") == "x > 0")
    assert(desc.getAs[Long]("bound_version") == 0L)
    assert(desc.getAs[Long]("source_version") == 2L)
    assert(desc.getAs[Long]("versions_behind") == 2L)
    GraftSql.execute(spark, store, "REFRESH MATERIALIZED VIEW d1_mv")
    val after = GraftSql.execute(spark, store,
      "DESCRIBE MATERIALIZED VIEW d1_mv").collect().head
    assert(after.getAs[Long]("versions_behind") == 0L)
  }

  test("MV refresh works inside a script alongside source DML") {
    val store = new TableStore(spark, tmpDir("mvsql3"))
    store.create("ev", Seq((1L, "x", 1.0), (2L, "y", 2.0))
      .toDF("id", "g", "v"))
    GraftSql.execute(spark, store,
      "CREATE MATERIALIZED VIEW ev_mv AS " +
        "SELECT g, count(*), sum(v) FROM ev GROUP BY g")
    val out = GraftSql.executeScript(spark, store,
      """INSERT INTO ev VALUES (3, 'x', 5.0);
        |DELETE FROM ev WHERE id = 2;
        |REFRESH MATERIALIZED VIEW ev_mv;
        |SELECT g, cnt, sum_v FROM ev_mv ORDER BY g""".stripMargin)
    assert(out.as[(String, Long, Double)].collect().toSeq ==
      Seq(("x", 2L, 6.0)))
  }

  test("SHOW MATERIALIZED VIEWS lists the registry with shape and freshness") {
    val store = new TableStore(spark, tmpDir("mvshow"))
    store.create("a", Seq((1L, "g", 1.0)).toDF("id", "g", "x"))
    store.create("b", Seq((1L, "s")).toDF("id", "s"))
    GraftSql.execute(spark, store,
      "CREATE MATERIALIZED VIEW a_mv AS SELECT g, count(*) FROM a GROUP BY g")
    MaterializedView.createJoined(store, "ab_mv", "a", "b", Seq("id"),
      Seq("s"), Nil)
    store.append("a", Seq((2L, "h", 2.0)).toDF("id", "g", "x"))
    val got = GraftSql.execute(spark, store, "SHOW MATERIALIZED VIEWS")
      .orderBy("view_name")
      .as[(String, String, String, String, Boolean)].collect().toSeq
    // both views are now STALE (the source moved past their binding)
    assert(got == Seq(("a_mv", "a", "", "g", false),
      ("ab_mv", "a", "b", "s", false)))
    GraftSql.execute(spark, store, "REFRESH MATERIALIZED VIEW a_mv")
    val fresh = GraftSql.execute(spark, store, "SHOW MATERIALIZED VIEWS")
      .where(col("view_name") === "a_mv").select("fresh")
      .as[Boolean].head()
    assert(fresh)
  }

  test("DROP MATERIALIZED VIEW removes the view AND its definition companion") {
    val store = new TableStore(spark, tmpDir("mvdrop"))
    store.create("s", Seq((1L, "a", 1.0)).toDF("id", "g", "x"))
    GraftSql.execute(spark, store,
      "CREATE MATERIALIZED VIEW s_mv AS SELECT g, count(*) FROM s GROUP BY g")
    assert(store.exists("s_mv") && store.exists("s_mv__def"))
    val r = GraftSql.execute(spark, store, "DROP MATERIALIZED VIEW s_mv")
      .as[(String, Boolean)].head()
    assert(r == ("s_mv", true))
    assert(!store.exists("s_mv") && !store.exists("s_mv__def"))
    assert(GraftSql.execute(spark, store, "SHOW MATERIALIZED VIEWS").isEmpty)
    // a plain table is NOT a materialized view; IF EXISTS tolerates both
    intercept[IllegalArgumentException] {
      GraftSql.execute(spark, store, "DROP MATERIALIZED VIEW s")
    }
    assert(!GraftSql.execute(spark, store,
      "DROP MATERIALIZED VIEW IF EXISTS nope").as[(String, Boolean)].head()._2)
    assert(store.exists("s"))
  }

  test("DROP IF EXISTS tolerates any whitespace; orphan __def never blocks re-CREATE") {
    val store = new TableStore(spark, tmpDir("mvsqld"))
    // IF\n  EXISTS — the regex grammar accepts it, so the no-op
    // detection must too (a contains("IF EXISTS") probe would throw)
    assert(!GraftSql.execute(spark, store,
      "DROP MATERIALIZED VIEW IF\n  EXISTS nothere")
      .as[(String, Boolean)].head()._2)
    // orphan __def (the residue of a DROP that crashed between the
    // two deletes): CREATE of the same view name replaces it
    store.create("s", Seq((1L, "a", 2.0), (2L, "b", 3.0)).toDF("id", "g", "x"))
    GraftSql.execute(spark, store,
      "CREATE MATERIALIZED VIEW o_mv AS SELECT g, count(*) FROM s GROUP BY g")
    store.drop("o_mv") // simulate the crash: view gone, __def orphaned
    assert(store.exists("o_mv__def"))
    GraftSql.execute(spark, store,
      "CREATE MATERIALIZED VIEW o_mv AS " +
        "SELECT g, count(*), sum(x) FROM s GROUP BY g")
    val got = GraftSql.execute(spark, store,
      "SELECT g, cnt, sum_x FROM o_mv ORDER BY g")
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("a", 1L, 2.0), ("b", 1L, 3.0)))
  }

  test("CREATE MATERIALIZED VIEW over a JOIN maintains both sides incl. min/max") {
    val store = new TableStore(spark, tmpDir("mvsqlj"))
    store.create("fct", Seq((1L, 10L, 2.0), (2L, 10L, 3.0), (3L, 20L, 4.0))
      .toDF("id", "k", "x"))
    store.create("dmn", Seq((10L, "east"), (20L, "west")).toDF("k", "seg"))
    val created = GraftSql.execute(spark, store,
      "CREATE MATERIALIZED VIEW j_mv AS " +
        "SELECT seg, count(*), sum(x), avg(x), min(x), max(x) " +
        "FROM fct JOIN dmn USING (k) GROUP BY seg")
    assert(created.columns.contains("dim"))
    // mutate BOTH sides, one REFRESH folds both cursors atomically;
    // the dim delete re-keys fact rows, exercising the join-side
    // extremum repair (east's max leaves with the re-keying)
    GraftSql.execute(spark, store, "INSERT INTO fct VALUES (4, 20, 6.0)")
    store.appendWithDeletes("dmn", Seq((10L, "north")).toDF("k", "seg"),
      deleteKeys = Seq(10L).toDF("k"))
    GraftSql.execute(spark, store, "REFRESH MATERIALIZED VIEW j_mv")
    val got = GraftSql.execute(spark, store,
      "SELECT seg, cnt, sum_x, avg_x, min_x, max_x FROM j_mv ORDER BY seg")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSeq
    assert(got == Seq(("north", 2L, 5.0, 2.5, 2.0, 3.0),
      ("west", 2L, 10.0, 5.0, 4.0, 6.0)))
    // a fact-side MoR delete removes west's maximum; the repair must
    // recompute that group's extrema from the re-joined slice
    store.appendWithDeletes("fct", spark.emptyDataFrame
      .select(lit(0L).as("id"), lit(0L).as("k"), lit(0.0).as("x")).limit(0),
      deleteKeys = Seq(4L).toDF("id"))
    GraftSql.execute(spark, store, "REFRESH MATERIALIZED VIEW j_mv")
    val got2 = GraftSql.execute(spark, store,
      "SELECT seg, cnt, min_x, max_x FROM j_mv ORDER BY seg")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got2 == Seq(("north", 2L, 2.0, 3.0), ("west", 1L, 4.0, 4.0)))
  }

  test("3-table star CREATE via SQL: chained USING joins, all cursors advance") {
    val store = new TableStore(spark, tmpDir("mvsqls"))
    store.create("f", Seq((1L, 1L, 10L, 2.0), (2L, 2L, 20L, 3.0),
      (3L, 1L, 20L, 5.0)).toDF("id", "ka", "kb", "x"))
    store.create("da", Seq((1L, "a1"), (2L, "a2")).toDF("ka", "sa"))
    store.create("db", Seq((10L, "b1"), (20L, "b2")).toDF("kb", "sb"))
    GraftSql.execute(spark, store,
      "CREATE MATERIALIZED VIEW s_mv AS SELECT sa, sb, count(*), sum(x) " +
        "FROM f JOIN da USING (ka) JOIN db USING (kb) GROUP BY sa, sb")
    // every table moves; one refresh folds all three cursors
    GraftSql.execute(spark, store, "INSERT INTO f VALUES (4, 2, 10, 7.0)")
    store.appendWithDeletes("da", Seq((1L, "a9")).toDF("ka", "sa"),
      deleteKeys = Seq(1L).toDF("ka"))
    GraftSql.execute(spark, store, "INSERT INTO db VALUES (30, 'b3')")
    GraftSql.execute(spark, store, "REFRESH MATERIALIZED VIEW s_mv")
    val got = GraftSql.execute(spark, store,
      "SELECT sa, sb, cnt, sum_x FROM s_mv ORDER BY sa, sb")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(("a2", "b1", 1L, 7.0), ("a2", "b2", 1L, 3.0),
      ("a9", "b1", 1L, 2.0), ("a9", "b2", 1L, 5.0)))
    // the recompute agrees (full star join over final states)
    val recomputed = store.read("f")
      .join(store.read("da"), Seq("ka")).join(store.read("db"), Seq("kb"))
      .groupBy("sa", "sb").agg(count(lit(1)).as("cnt"), sum("x").as("sum_x"))
      .orderBy("sa", "sb")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == recomputed)
  }
}
