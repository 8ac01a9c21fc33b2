package graft.sources

import graft.SparkSpec
import graft.lake.{GraftSql, MaterializedView, TableStore}
import org.apache.spark.sql.functions._

/** `CALL <cat>.system.<proc>(...)` — Spark 4 stored procedures bound
  * onto the store's maintenance machinery ([[GraftProcedures]]): the
  * Iceberg maintenance idiom, runnable by a vanilla session that
  * never imports graft. */
class GraftProceduresSpec extends SparkSpec {
  import spark.implicits._

  private def catalog(root: String, name: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
  }

  test("CALL system.optimize bin-packs small commits; named and positional args") {
    val root = tmpDir("proc-opt")
    val store = new TableStore(spark, root)
    store.create("t", (1 to 10).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
      .coalesce(1))
    (1 to 4).foreach { k =>
      store.append("t", Seq((100L + k, k * 1.0)).toDF("id", "v").coalesce(1))
    }
    catalog(root, "gp1")
    def files(): Int = store
      .manifest("t", store.currentVersion("t").get)
      .count(l => !l.startsWith("del|") && !l.startsWith("dv|"))
    assert(files() == 5)
    val before = store.read("t").orderBy("id").collect().toSeq

    val summary = spark.sql("CALL gp1.system.optimize(table => 't')").collect()
    assert(summary.length == 1)
    assert(summary.head.getAs[String]("table") == "t")
    assert(summary.head.getAs[String]("operation") == "compact")
    assert(files() == 1, "small files should bin-pack into one")
    assert(store.read("t").orderBy("id").collect().toSeq == before)

    // positional args: zorder_by rewrites into a clustered layout
    store.append("t", Seq((200L, 0.5)).toDF("id", "v"))
    val z = spark.sql("CALL gp1.system.optimize('t', 'id')").collect()
    assert(z.head.getAs[String]("operation") == "zorder")
    assert(store.read("t").count() == before.length + 1)
  }

  test("CALL system.vacuum trims history; both retain args is an error") {
    val root = tmpDir("proc-vac")
    val store = new TableStore(spark, root)
    store.create("h", Seq((1L, "a")).toDF("id", "s"))
    (1 to 3).foreach(i => store.append("h", Seq((i + 1L, "x")).toDF("id", "s")))
    catalog(root, "gp2")
    assert(store.versions("h").size == 4)
    val kept = spark.sql(
      "CALL gp2.system.vacuum(table => 'h', retain_versions => 2)").collect()
    assert(kept.map(_.getAs[Long]("version")).sorted.toSeq == Seq(2L, 3L))
    assert(store.versions("h") == Seq(2L, 3L))
    val err = intercept[Exception] {
      spark.sql("CALL gp2.system.vacuum('h', 1L, 1L)").collect()
    }
    assert(err.getMessage.contains("not both"))
  }

  test("CALL system.export_snapshot writes flat parquet any engine reads") {
    val root = tmpDir("proc-exp")
    val store = new TableStore(spark, root)
    store.create("e", (1 to 20).map(i => (i.toLong, "s" + i)).toDF("id", "s"))
    // make the raw layout unreadable without manifest semantics
    store.deleteWhere("e", col("id") <= 5L)
    store.renameColumn("e", "s", "label")
    catalog(root, "gp3")
    val dest = tmpDir("proc-exp-out") + "/snap"
    val sum = spark.sql(
      s"CALL gp3.system.export_snapshot(table => 'e', location => '$dest')")
      .collect()
    assert(sum.head.getAs[String]("export_path") == dest)
    val exported = spark.read.parquet(dest)
    assert(exported.columns.toSeq == Seq("id", "label"))
    assert(exported.orderBy("id").collect().toSeq ==
      store.read("e").orderBy("id").collect().toSeq)
  }

  test("CALL system.refresh_mv folds pending deltas; restore rolls back") {
    val root = tmpDir("proc-mvr")
    val store = new TableStore(spark, root)
    store.create("src", Seq((1L, "a", 10.0), (2L, "a", 5.0), (3L, "b", 1.0))
      .toDF("id", "g", "x"))
    GraftSql.execute(spark, store,
      "CREATE MATERIALIZED VIEW m AS SELECT g, count(*), sum(x) " +
        "FROM src GROUP BY g")
    store.append("src", Seq((4L, "b", 9.0)).toDF("id", "g", "x"))
    catalog(root, "gp4")
    val r = spark.sql("CALL gp4.system.refresh_mv(view => 'm')").collect()
    assert(r.head.getAs[String]("view_name") == "m")
    val served = MaterializedView.read(store, "m")
      .orderBy("g").select("g", "cnt", "sum_x").collect().toSeq.map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(served == Seq(("a", 2L, 15.0), ("b", 2L, 10.0)))

    // restore: O(1) rollback to the pre-append source state
    val cur = store.currentVersion("src").get
    val back = spark.sql("CALL gp4.system.restore(table => 'src', version => 0)")
      .collect()
    assert(back.head.getAs[Long]("restored_to") == 0L)
    assert(back.head.getAs[Long]("current_version") == cur + 1)
    assert(store.read("src").count() == 3)
  }

  test("CALL system.history / detail surface commit metadata, no scan") {
    val root = tmpDir("proc-hist")
    val store = new TableStore(spark, root)
    store.create("ht", Seq((1L, "a")).toDF("id", "s"))
    store.append("ht", Seq((2L, "b")).toDF("id", "s"))
    catalog(root, "gp7")
    val hist = spark.sql("CALL gp7.system.history(table => 'ht')").collect()
    assert(hist.map(_.getAs[Long]("version")).sorted.toSeq == Seq(0L, 1L))
    assert(hist.map(_.getAs[String]("operation")).toSet == Set("CREATE", "APPEND"))
    val det = spark.sql("CALL gp7.system.detail('ht')").collect()
    assert(det.length == 1 && det.head.getAs[Long]("version") == 1L)
    assert(det.head.getAs[Long]("n_rows") == 2L)
  }

  test("SHOW PROCEDURES lists the system namespace; unknown name is loud") {
    val root = tmpDir("proc-show")
    new TableStore(spark, root) // ensure root exists
    catalog(root, "gp5")
    val listed = spark.sql("SHOW PROCEDURES IN gp5.system")
      .select("procedure_name").as[String].collect().toSet
    assert(listed == Set("optimize", "vacuum", "export_snapshot",
      "refresh_mv", "restore", "history", "detail"))
    val err = intercept[Exception] {
      spark.sql("CALL gp5.system.compact_everything('t')").collect()
    }
    // Spark wraps loadProcedure failures (FAILED_TO_LOAD_ROUTINE);
    // the loud available-procedures list rides the cause chain
    val messages = Iterator.iterate(err: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString("\n")
    assert(messages.contains("available:"))
  }

  test("constructed verb text cannot be injected through identifiers/paths") {
    val root = tmpDir("proc-inj")
    val store = new TableStore(spark, root)
    store.create("ok", Seq((1L, "a")).toDF("id", "s"))
    catalog(root, "gp6")
    val e1 = intercept[Exception] {
      spark.sql("CALL gp6.system.optimize(table => 'ok ZORDER BY (id)')")
        .collect()
    }
    assert(e1.getMessage.contains("plain identifier"))
    val e2 = intercept[Exception] {
      spark.sql("CALL gp6.system.export_snapshot('ok', \"/x' VERSION AS OF 1--\")")
        .collect()
    }
    assert(e2.getMessage.contains("must not contain"))
  }
}
