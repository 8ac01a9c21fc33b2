package graft.plans

import graft.SparkSpec
import graft.lake.TableStore
import graft.sources.GraftCatalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level SQL against catalog-addressed graft tables in a vanilla
  * session (the GraftExtensions-injected DML path): MERGE / UPDATE /
  * DELETE by plain `spark.sql`, landing as store commits. */
class GraftDmlSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(cat: String): (TableStore, String) = {
    val root = tmpDir("dml-" + cat)
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (new TableStore(spark, root), root)
  }

  private def rows(df: DataFrame): Seq[(Long, String, Double)] =
    df.select("id", "g", "x").as[(Long, String, Double)]
      .collect().toSeq.sortBy(_._1)

  private def seed(store: TableStore, t: String = "t"): Unit =
    store.create(t, Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "b", 4.0))
      .toDF("id", "g", "x"))

  test("catalog MERGE: matched UPDATE + not matched INSERT") {
    val (store, _) = freshStore("gd1")
    seed(store)
    spark.sql(
      """MERGE INTO gd1.t AS t
        |USING (SELECT * FROM VALUES (2L, 20.0), (3L, 30.0), (9L, 90.0)
        |       AS s(id, x)) AS s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET x = s.x
        |WHEN NOT MATCHED THEN INSERT (id, g, x) VALUES (s.id, 'new', s.x)
        |""".stripMargin)
    assert(rows(store.read("t")) == Seq(
      (1L, "a", 1.0), (2L, "a", 20.0), (3L, "b", 30.0), (4L, "b", 4.0),
      (9L, "new", 90.0)))
  }

  test("catalog MERGE: conditional matched DELETE/UPDATE chain, first action wins") {
    val (store, _) = freshStore("gd2")
    seed(store)
    spark.sql(
      """MERGE INTO gd2.t AS t
        |USING (SELECT * FROM VALUES (1L, 'D'), (2L, 'U'), (3L, 'U')
        |       AS s(id, op)) AS s
        |ON t.id = s.id
        |WHEN MATCHED AND s.op = 'D' THEN DELETE
        |WHEN MATCHED THEN UPDATE SET x = t.x * 10
        |""".stripMargin)
    assert(rows(store.read("t")) == Seq(
      (2L, "a", 20.0), (3L, "b", 30.0), (4L, "b", 4.0)))
  }

  test("catalog MERGE: NOT MATCHED BY SOURCE delete + update") {
    val (store, _) = freshStore("gd3")
    seed(store)
    spark.sql(
      """MERGE INTO gd3.t AS t
        |USING (SELECT 1L AS id UNION ALL SELECT 2L) AS s
        |ON t.id = s.id
        |WHEN NOT MATCHED BY SOURCE AND t.g = 'b' AND t.x > 3.5 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET g = 'stale'
        |""".stripMargin)
    // rows 1,2 matched: carried; row 4 deleted; row 3 updated
    assert(rows(store.read("t")) == Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "stale", 3.0)))
  }

  test("insert-only MERGE commits as a blind append (old files carried)") {
    val (store, _) = freshStore("gd4")
    seed(store)
    val v0 = store.currentVersion("t").get
    val m0 = store.manifest("t", v0).toSet
    spark.sql(
      """MERGE INTO gd4.t AS t
        |USING (SELECT * FROM VALUES (4L, 40.0), (5L, 50.0), (6L, 60.0)
        |       AS s(id, x)) AS s
        |ON t.id = s.id
        |WHEN NOT MATCHED AND s.x < 55.0 THEN INSERT (id, g, x)
        |  VALUES (s.id, 'ins', s.x)
        |""".stripMargin)
    val v1 = store.currentVersion("t").get
    assert(v1 == v0 + 1)
    // append, not rewrite: every pre-merge file carries by reference
    val m1 = store.manifest("t", v1).toSet
    assert(m0.subsetOf(m1), "insert-only merge must carry old files")
    // id=4 matched (no insert), id=6 fails the insert condition
    assert(rows(store.read("t")) == Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "b", 4.0),
      (5L, "ins", 50.0)))
  }

  test("catalog MERGE raises on cardinality violation (two source matches)") {
    val (store, _) = freshStore("gd5")
    seed(store)
    val e = intercept[Exception] {
      spark.sql(
        """MERGE INTO gd5.t AS t
          |USING (SELECT * FROM VALUES (2L, 20.0), (2L, 21.0) AS s(id, x)) AS s
          |ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET x = s.x
          |""".stripMargin)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("cardinality")),
      s"expected cardinality violation, got $e")
    // nothing half-applied
    assert(rows(store.read("t")) == Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "b", 4.0)))
  }

  test("catalog UPDATE: conditional multi-assignment, NULL condition keeps") {
    val (store, _) = freshStore("gd6")
    val df = Seq((1L, "a", Some(1.0)), (2L, "a", None), (3L, "b", Some(3.0)))
      .toDF("id", "g", "x")
    store.create("t", df)
    spark.sql("UPDATE gd6.t SET g = concat(g, '!'), x = x + 0.5 WHERE x > 0.5")
    val got = store.read("t").select("id", "g", "x")
      .as[(Long, String, Option[Double])].collect().toSeq.sortBy(_._1)
    // row 2: x NULL -> condition NULL -> untouched
    assert(got == Seq((1L, "a!", Some(1.5)), (2L, "a", None),
      (3L, "b!", Some(3.5))))
  }

  test("catalog DELETE: TRUE deletes, NULL keeps; snapshot pinned commit") {
    val (store, _) = freshStore("gd7")
    val df = Seq((1L, "a", Some(1.0)), (2L, "a", None), (3L, "b", Some(3.0)))
      .toDF("id", "g", "x")
    store.create("t", df)
    val v0 = store.currentVersion("t").get
    spark.sql("DELETE FROM gd7.t WHERE x > 2.0")
    assert(store.currentVersion("t").get == v0 + 1)
    val got = store.read("t").select("id").as[Long].collect().toSeq.sorted
    assert(got == Seq(1L, 2L), "NULL predicate must keep the row")
  }

  test("catalog DML parity with the GraftSql front-door forms") {
    val (store, _) = freshStore("gd8")
    seed(store)
    val front = new TableStore(spark, tmpDir("dml-front"))
    seed(front)
    spark.sql("UPDATE gd8.t SET x = x * 2 WHERE g = 'a'")
    graft.lake.GraftSql.execute(spark, front,
      "UPDATE t SET x = x * 2 WHERE g = 'a'")
    spark.sql("DELETE FROM gd8.t WHERE x >= 6.0")
    graft.lake.GraftSql.execute(spark, front, "DELETE FROM t WHERE x >= 6.0")
    assert(rows(store.read("t")) == rows(front.read("t")))
  }

  test("DML on a live view's __def companion is refused (definition shielded)") {
    val (store, _) = freshStore("gd13")
    seed(store)
    graft.lake.MaterializedView.create(store, "mv", "t", Seq("g"), Seq("x"))
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    for (stmt <- Seq(
        "DELETE FROM gd13.mv__def WHERE true",
        "UPDATE gd13.mv__def SET src = 'boom'",
        """MERGE INTO gd13.mv__def AS d USING (SELECT 'x' AS src) AS s
          |ON d.src = s.src WHEN MATCHED THEN DELETE""".stripMargin)) {
      val e = intercept[Exception] { spark.sql(stmt) }
      assert(messages(e).exists(_.contains("definition companion")),
        s"expected companion shield for: $stmt, got $e")
    }
    assert(store.read("mv__def").count() == 1,
      "the definition row must be intact after every refused statement")
  }

  test("DML on a materialized view is refused; plain-session tables unaffected") {
    val (store, _) = freshStore("gd9")
    seed(store)
    graft.lake.MaterializedView.create(store, "mv", "t", Seq("g"), Seq("x"))
    val e = intercept[Exception] {
      spark.sql("DELETE FROM gd9.mv WHERE cnt > 0")
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("materialized view")))
    // non-graft targets still take Spark's own path (error text is
    // Spark's, not ours) — the rule must not claim them
    Seq((1L, "x")).toDF("id", "s").createOrReplaceTempView("plainv")
    intercept[Exception] { spark.sql("DELETE FROM plainv WHERE id = 1") }
  }

  test("catalog DELETE/UPDATE with IN-subquery predicates") {
    val (store, _) = freshStore("gd11")
    seed(store)
    Seq(1L, 3L).toDF("id").createOrReplaceTempView("kill_ids")
    spark.sql("DELETE FROM gd11.t WHERE id IN (SELECT id FROM kill_ids)")
    assert(rows(store.read("t")) == Seq((2L, "a", 2.0), (4L, "b", 4.0)))
    spark.sql("UPDATE gd11.t SET x = x + 100 WHERE id NOT IN " +
      "(SELECT id FROM kill_ids)")
    assert(rows(store.read("t")) == Seq((2L, "a", 102.0), (4L, "b", 104.0)))
  }

  test("catalog MERGE star actions: UPDATE SET * and INSERT *") {
    val (store, _) = freshStore("gd12")
    seed(store)
    // source column order matches the target (star actions map by name
    // after resolution expands them)
    Seq((2L, "up", 20.0), (9L, "new", 90.0)).toDF("id", "g", "x")
      .createOrReplaceTempView("star_src")
    spark.sql(
      """MERGE INTO gd12.t AS t USING star_src AS s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *
        |""".stripMargin)
    assert(rows(store.read("t")) == Seq(
      (1L, "a", 1.0), (2L, "up", 20.0), (3L, "b", 3.0), (4L, "b", 4.0),
      (9L, "new", 90.0)))
  }

  test("catalog MERGE onto a partitioned table keeps the layout") {
    val (store, _) = freshStore("gd10")
    store.create("t", Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))
      .toDF("id", "g", "x"), partitionBy = Seq("g"))
    spark.sql(
      """MERGE INTO gd10.t AS t
        |USING (SELECT 2L AS id, 22.0 AS x UNION ALL SELECT 7L, 77.0) AS s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET x = s.x
        |WHEN NOT MATCHED THEN INSERT (id, g, x) VALUES (s.id, 'c', s.x)
        |""".stripMargin)
    assert(rows(store.read("t")) == Seq(
      (1L, "a", 1.0), (2L, "a", 22.0), (3L, "b", 3.0), (7L, "c", 77.0)))
    assert(store.partitioning("t") == Seq("g"))
    // files still live under hive partition dirs
    val m = store.manifest("t", store.currentVersion("t").get)
    assert(m.forall(_.contains("/g=")), s"layout lost: $m")
  }
}
