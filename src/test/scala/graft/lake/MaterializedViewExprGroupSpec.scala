package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Derived (expression) group columns — the daily/hourly-rollup view
  * shape: the view groups by an expression over source columns,
  * every fold path projects it before grouping, and maintenance is
  * exactly as if the source carried the derived column. */
class MaterializedViewExprGroupSpec extends SparkSpec {
  import spark.implicits._

  private def rows(from: Int, n: Int) =
    (from until from + n).map(i => (i.toLong, i.toDouble))
      .toDF("id", "x")

  private def parity(store: TableStore, mv: String): Unit = {
    val got = MaterializedView.read(store, mv)
      .select("bucket", "cnt", "sum_x", "min_x", "max_x").orderBy("bucket")
      .collect().toSeq
    val want = store.read("t")
      .withColumn("bucket", (col("x") / 10).cast("int"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"), sum("x").as("sum_x"),
        min("x").as("min_x"), max("x").as("max_x"))
      .orderBy("bucket").collect().toSeq
    assert(got == want, s"derived-group view diverged:\n got  $got\n want $want")
  }

  test("API: derived group maintains under append, MoR delete (min/max repair), compact") {
    val store = new TableStore(spark, tmpDir("mveg"))
    store.create("t", rows(0, 35))
    MaterializedView.create(store, "m", "t", Seq("bucket"), Seq("x"),
      minCols = Seq("x"), maxCols = Seq("x"),
      groupExprs = Seq("CAST(x / 10 AS INT)"))
    parity(store, "m")
    store.append("t", rows(35, 20))
    MaterializedView.refresh(store, "m")
    parity(store, "m")
    // delete bucket 1's maximum (19) and ALL of bucket 3 — the repair
    // recompute must project the derived group before the semi-join
    store.appendWithDeletes("t", rows(0, 0),
      deleteKeys = (Seq(19L) ++ (30L to 39L)).toDF("id"))
    MaterializedView.refresh(store, "m")
    parity(store, "m")
    assert(!MaterializedView.read(store, "m").select("bucket").as[Int]
      .collect().contains(3))
    MaterializedView.compactPartials(store, "m")
    parity(store, "m")
  }

  test("SQL: <expr> AS alias in the select list; GROUP BY uses the alias") {
    val store = new TableStore(spark, tmpDir("mvegs"))
    store.create("ev", (0 until 40).map(i =>
      (i.toLong, i.toLong * 1000000L, (i % 7).toDouble))
      .toDF("id", "ts", "v"))
    GraftSql.execute(spark, store,
      """CREATE MATERIALIZED VIEW ev_day AS
        |SELECT CAST(ts / 10000000 AS BIGINT) AS day, count(*), sum(v)
        |FROM ev GROUP BY day""".stripMargin)
    GraftSql.execute(spark, store, "INSERT INTO ev VALUES (40, 41000000, 3.0)")
    GraftSql.execute(spark, store, "REFRESH MATERIALIZED VIEW ev_day")
    val got = GraftSql.execute(spark, store,
      "SELECT day, cnt, sum_v FROM ev_day ORDER BY day")
      .as[(Long, Long, Double)].collect().toSeq
    val want = store.read("ev")
      .withColumn("day", (col("ts") / 10000000L).cast("long"))
      .groupBy("day").agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"))
      .orderBy("day").as[(Long, Long, Double)].collect().toSeq
    assert(got == want)
    // GROUP BY must name the alias, not repeat the expression
    val e = intercept[IllegalArgumentException] {
      GraftSql.execute(spark, store,
        "CREATE MATERIALIZED VIEW bad AS SELECT CAST(ts / 10 AS BIGINT) " +
          "AS d, count(*) FROM ev GROUP BY CAST(ts / 10 AS BIGINT)")
    }
    assert(e.getMessage.contains("alias"))
  }

  test("join view with a derived group over the joined frame") {
    val store = new TableStore(spark, tmpDir("mvegj"))
    store.create("f", (0 until 30).map(i =>
      (i.toLong, (i % 3).toLong, i.toDouble)).toDF("id", "k", "x"))
    store.create("d", (0L to 2L).map(k => (k, k * 100)).toDF("k", "base"))
    MaterializedView.createJoined(store, "jm", "f", "d", Seq("k"),
      Seq("grp"), Seq("x"),
      groupExprs = Seq("CAST((base + x) / 50 AS INT)"))
    store.append("f", (30 until 40).map(i =>
      (i.toLong, (i % 3).toLong, i.toDouble)).toDF("id", "k", "x"))
    MaterializedView.refresh(store, "jm")
    val got = MaterializedView.read(store, "jm")
      .select("grp", "cnt", "sum_x").orderBy("grp").collect().toSeq
    val want = store.read("f").join(store.read("d"), Seq("k"))
      .withColumn("grp", ((col("base") + col("x")) / 50).cast("int"))
      .groupBy("grp").agg(count(lit(1)).as("cnt"), sum("x").as("sum_x"))
      .orderBy("grp").collect().toSeq
    assert(got == want)
  }
}
