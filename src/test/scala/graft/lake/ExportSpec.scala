package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXPORT TABLE — the consolidated plain-parquet snapshot any engine
  * can read. The exported files must carry the table's LOGICAL state
  * (deletes applied, renames resolved), not the raw dir's physical
  * husks. */
class ExportSpec extends SparkSpec {
  import spark.implicits._

  private def sorted(df: DataFrame): Seq[org.apache.spark.sql.Row] =
    df.collect().toSeq.sortBy(_.mkString("|"))

  test("export == store read across MoR deletes and a column rename") {
    val store = new TableStore(spark, tmpDir("exp"))
    store.create("t", (1 to 20).map(i => (i.toLong, "g" + (i % 3), i * 1.0))
      .toDF("id", "g", "x"))
    store.appendWithDeletes("t", spark.emptyDataset[(Long, String, Double)]
      .toDF("id", "g", "x"),
      deleteKeys = Seq(3L, 9L).toDF("id"))
    GraftSql.execute(spark, store, "ALTER TABLE t RENAME COLUMN x TO score")
    val dest = tmpDir("exp-out") + "/snap"
    val out = GraftSql.execute(spark, store, s"EXPORT TABLE t TO '$dest'")
    assert(out.select("table_name", "export_path").as[(String, String)]
      .head() == ("t", dest))
    val readBack = spark.read.parquet(dest)
    assert(readBack.columns.toSeq.sorted == Seq("g", "id", "score"),
      "export must carry LOGICAL column names")
    assert(sorted(readBack.select("id", "g", "score")) ==
      sorted(store.read("t").select("id", "g", "score")))
    assert(readBack.where(col("id").isin(3L, 9L)).isEmpty,
      "MoR deletes must be applied in the export")
  }

  test("VERSION AS OF exports the pinned snapshot; unretained refused") {
    val store = new TableStore(spark, tmpDir("expv"))
    store.create("t", Seq((1L, "a")).toDF("id", "s"))
    store.append("t", Seq((2L, "b")).toDF("id", "s"))
    val dest = tmpDir("expv-out") + "/snap"
    GraftSql.execute(spark, store,
      s"EXPORT TABLE t TO '$dest' VERSION AS OF 0")
    assert(spark.read.parquet(dest).count() == 1)
    intercept[Exception] {
      GraftSql.execute(spark, store,
        s"EXPORT TABLE t TO '$dest' VERSION AS OF 99")
    }
    // overwrite semantics: a re-export replaces, never appends
    GraftSql.execute(spark, store, s"EXPORT TABLE t TO '$dest'")
    assert(spark.read.parquet(dest).count() == 2)
  }

  test("a materialized view exports consolidated rows, not signed partials") {
    val store = new TableStore(spark, tmpDir("expmv"))
    store.create("src", (1 to 30).map(i => (i.toLong, "g" + (i % 3), i * 1.0))
      .toDF("id", "g", "x"))
    MaterializedView.create(store, "m", "src", Seq("g"), Seq("x"))
    store.append("src", Seq((31L, "g0", 5.0)).toDF("id", "g", "x"))
    MaterializedView.refresh(store, "m")
    val dest = tmpDir("expmv-out") + "/snap"
    GraftSql.execute(spark, store, s"EXPORT TABLE m TO '$dest'")
    val got = sorted(spark.read.parquet(dest).select("g", "cnt", "sum_x"))
    val want = sorted(MaterializedView.read(store, "m")
      .select("g", "cnt", "sum_x"))
    assert(got == want)
    intercept[Exception] {
      GraftSql.execute(spark, store,
        s"EXPORT TABLE m TO '$dest' VERSION AS OF 0")
    }
  }
}
