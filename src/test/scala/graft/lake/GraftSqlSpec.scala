package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  test("MERGE INTO ... WHEN MATCHED THEN DELETE executes on the store") {
    val store = new TableStore(spark, tmpDir("gsql"))
    store.create("dest", Seq(("k1", 1), ("k2", 2), ("k3", 3)).toDF("pk", "v"))
    Seq("k1", "k3").toDF("pk").createOrReplaceTempView("input_data_updates")
    // the reference's literal statement shape (icberg/iceberg_tables.py:45-50)
    val out = GraftSql.execute(spark, store,
      """MERGE INTO dest t USING input_data_updates u
        |ON t.pk = u.pk
        |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(out.select("pk").as[String].collect().toSeq == Seq("k2"))
    // committed, not just returned
    assert(store.read("dest").count() == 1)
    assert(store.currentVersion("dest").contains(1L))
  }

  test("compound equi-condition extracts all keys") {
    val store = new TableStore(spark, tmpDir("gsql"))
    store.create("d2", Seq(("a", 1, "x"), ("a", 2, "y"), ("b", 1, "z"))
      .toDF("k1", "k2", "v"))
    Seq(("a", 1)).toDF("k1", "k2").createOrReplaceTempView("upd2")
    GraftSql.execute(spark, store,
      "MERGE INTO d2 t USING upd2 u ON t.k1 = u.k1 AND t.k2 = u.k2 " +
        "WHEN MATCHED THEN DELETE")
    assert(store.read("d2").select("v").as[String].collect().sorted
      .toSeq == Seq("y", "z"))
  }

  test("non-MERGE statements delegate to spark.sql") {
    val r = GraftSql.execute(spark, new TableStore(spark, tmpDir("gsql")),
      "SELECT 1 + 1 AS two")
    assert(r.as[Int].head() == 2)
  }

  test("unsupported merge forms are rejected with a clear error") {
    val store = new TableStore(spark, tmpDir("gsql"))
    store.create("d3", Seq(("k1", 1)).toDF("pk", "v"))
    Seq(("k1", 9)).toDF("pk", "v").createOrReplaceTempView("upd3")
    val e = intercept[IllegalArgumentException] {
      GraftSql.execute(spark, store,
        "MERGE INTO d3 t USING upd3 u ON t.pk = u.pk " +
          "WHEN MATCHED THEN UPDATE SET *")
    }
    assert(e.getMessage.contains("WHEN MATCHED THEN DELETE"))
  }
}
