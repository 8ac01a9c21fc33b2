package graft.sources

import graft.SparkSpec
import graft.lake.TableStore
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming over store tables ([[GraftStreamSource]] /
  * [[GraftStreamSink]]): `readStream.format("graft")` serves the
  * initial snapshot then per-commit appends with version offsets;
  * `writeStream.format("graft")` lands one exactly-once commit per
  * micro-batch. */
class GraftStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def drain(q: StreamingQuery): Unit =
    try q.processAllAvailable() finally q.stop()

  test("readStream serves the snapshot, then appends per commit; stream==batch") {
    val root = tmpDir("gs-src")
    val store = new TableStore(spark, root)
    store.create("s", (1 to 10).map(i => (i.toLong, "a")).toDF("id", "g"))
    store.append("s", (11 to 15).map(i => (i.toLong, "b")).toDF("id", "g"))

    val stream = spark.readStream.format("graft")
      .option("root", root).option("table", "s").load()
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("gs_out")
      .trigger(Trigger.ProcessingTime(0))
      .option("checkpointLocation", tmpDir("gs-ckpt")).start()
    try {
      q.processAllAvailable()
      // snapshot arrived as one batch
      assert(spark.table("gs_out").count() == 15)
      // two more commits arrive incrementally (and only their rows)
      store.append("s", Seq((16L, "c")).toDF("id", "g"))
      q.processAllAvailable()
      assert(spark.table("gs_out").count() == 16)
      // maintenance commits are content-neutral: nothing new served
      store.compact("s")
      store.append("s", Seq((17L, "c"), (18L, "c")).toDF("id", "g"))
      q.processAllAvailable()
      val got = spark.table("gs_out").select("id").as[Long].collect().sorted
      assert(got.toSeq == (1L to 18L))
    } finally q.stop()
  }

  test("a data-changing commit fails the stream unless skipChangeCommits") {
    val root = tmpDir("gs-chg")
    val store = new TableStore(spark, root)
    store.create("c", (1 to 6).map(i => (i.toLong, i * 1.0)).toDF("id", "v"))

    val q = spark.readStream.format("graft")
      .option("root", root).option("table", "c").load()
      .writeStream.format("memory").queryName("gs_chg")
      .option("checkpointLocation", tmpDir("gs-chg-ck")).start()
    q.processAllAvailable()
    store.deleteWhere("c", col("id") === 2L)
    store.append("c", Seq((7L, 7.0)).toDF("id", "v"))
    val err = intercept[Exception] { q.processAllAvailable() }
    assert(Iterator.iterate(err: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("data-changing"))))
    q.stop()
    // with skipChangeCommits the delete commit is skipped wholesale,
    // later appends still flow — fresh checkpoint, fresh snapshot
    val q2 = spark.readStream.format("graft")
      .option("root", root).option("table", "c")
      .option("skipChangeCommits", "true").load()
      .writeStream.format("memory").queryName("gs_chg2")
      .option("checkpointLocation", tmpDir("gs-chg-ck2")).start()
    try {
      q2.processAllAvailable()
      // snapshot reflects the delete; the post-delete append arrived
      assert(spark.table("gs_chg2").select("id").as[Long].collect().sorted
        .toSeq == Seq(1L, 3L, 4L, 5L, 6L, 7L))
      store.deleteWhere("c", col("id") === 3L) // skipped, no failure
      store.append("c", Seq((8L, 8.0)).toDF("id", "v"))
      q2.processAllAvailable()
      assert(spark.table("gs_chg2").select("id").as[Long].collect().sorted
        .toSeq == Seq(1L, 3L, 4L, 5L, 6L, 7L, 8L))
    } finally q2.stop()
  }

  test("startingVersion serves commits from v on, no snapshot") {
    val root = tmpDir("gs-sv")
    val store = new TableStore(spark, root)
    store.create("sv", Seq((1L, "old")).toDF("id", "s"))   // v0
    store.append("sv", Seq((2L, "mid")).toDF("id", "s"))   // v1
    store.append("sv", Seq((3L, "new")).toDF("id", "s"))   // v2
    val q = spark.readStream.format("graft")
      .option("root", root).option("table", "sv")
      .option("startingVersion", "2").load()
      .writeStream.format("memory").queryName("gs_sv")
      .option("checkpointLocation", tmpDir("gs-sv-ck")).start()
    try {
      q.processAllAvailable()
      assert(spark.table("gs_sv").select("s").as[String].collect().toSeq ==
        Seq("new"))
      // startingVersion=0 replays everything incrementally
      val q0 = spark.readStream.format("graft")
        .option("root", root).option("table", "sv")
        .option("startingVersion", "0").load()
        .writeStream.format("memory").queryName("gs_sv0")
        .option("checkpointLocation", tmpDir("gs-sv-ck0")).start()
      try {
        q0.processAllAvailable()
        assert(spark.table("gs_sv0").count() == 3)
      } finally q0.stop()
    } finally q.stop()
  }

  test("graft sink: per-batch atomic commits, exactly-once on replayed ids") {
    val root = tmpDir("gs-sink")
    val store = new TableStore(spark, root)
    store.create("in", (1 to 8).map(i => (i.toLong, "x")).toDF("id", "g"))
    store.create("out", Seq.empty[(Long, String)].toDF("id", "g"))

    val ckpt = tmpDir("gs-sink-ck")
    def run(): Unit = {
      val q = spark.readStream.format("graft")
        .option("root", root).option("table", "in").load()
        .writeStream.format("graft")
        .option("root", root).option("table", "out")
        .option("checkpointLocation", ckpt).start()
      drain(q)
    }
    run()
    assert(store.read("out").count() == 8)
    // restart over the SAME checkpoint: no new input, nothing re-lands
    run()
    assert(store.read("out").count() == 8)
    store.append("in", Seq((9L, "y")).toDF("id", "g"))
    run()
    assert(store.read("out").select("id").as[Long].collect().sorted.toSeq ==
      (1L to 9L))
    // the replay guard is the txn watermark, not the data
    assert(store.lastTxn("out", "graft-sink@" + ckpt).nonEmpty)
  }

  test("complete mode: a stateful aggregate lands as atomic overwrites") {
    val root = tmpDir("gs-agg")
    val store = new TableStore(spark, root)
    store.create("ev", (1 to 10).map(i => (i.toLong, "g" + (i % 2)))
      .toDF("id", "g"))
    store.create("agg", Seq.empty[(String, Long)].toDF("g", "n"))
    val ckpt = tmpDir("gs-agg-ck")
    def run(): Unit = {
      val q = spark.readStream.format("graft")
        .option("root", root).option("table", "ev").load()
        .groupBy("g").agg(count(lit(1)).as("n"))
        .writeStream.format("graft").outputMode("complete")
        .option("root", root).option("table", "agg")
        .option("checkpointLocation", ckpt).start()
      drain(q)
    }
    run()
    assert(store.read("agg").orderBy("g").as[(String, Long)].collect()
      .toSeq == Seq(("g0", 5L), ("g1", 5L)))
    // accumulated state survives the restart: counts keep growing
    store.append("ev", Seq((11L, "g1")).toDF("id", "g"))
    run()
    assert(store.read("agg").orderBy("g").as[(String, Long)].collect()
      .toSeq == Seq(("g0", 5L), ("g1", 6L)))
  }

  test("maxVersionsPerTrigger drains a backlog as bounded batches") {
    val root = tmpDir("gs-cap")
    val store = new TableStore(spark, root)
    store.create("b", Seq((0L, "v0")).toDF("id", "s"))
    (1 to 4).foreach(i => store.append("b", Seq((i.toLong, s"v$i"))
      .toDF("id", "s")))
    // 5 commits of backlog, one commit per micro-batch
    val q = spark.readStream.format("graft")
      .option("root", root).option("table", "b")
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "1").load()
      .writeStream.format("memory").queryName("gs_cap")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("gs-cap-ck")).start()
    try {
      q.awaitTermination(60000)
      assert(spark.table("gs_cap").select("id").as[Long].collect().sorted
        .toSeq == (0L to 4L))
      // the backlog drained one version per batch, not in one gulp
      assert(q.recentProgress.count(_.numInputRows > 0) >= 5,
        q.recentProgress.map(p => s"${p.batchId}:${p.numInputRows}")
          .mkString(","))
    } finally q.stop()
  }

  test("readStream.table(catalog.t) resolves through the V1 fallback") {
    val root = tmpDir("gs-cat")
    val store = new TableStore(spark, root)
    store.create("ct", (1 to 5).map(i => (i.toLong, "a")).toDF("id", "g"))
    spark.conf.set("spark.sql.catalog.gsc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsc.root", root)
    val q = spark.readStream.table("gsc.ct")
      .writeStream.format("memory").queryName("gs_cat")
      .option("checkpointLocation", tmpDir("gs-cat-ck")).start()
    try {
      q.processAllAvailable()
      assert(spark.table("gs_cat").count() == 5)
      store.append("ct", Seq((6L, "b")).toDF("id", "g"))
      q.processAllAvailable()
      assert(spark.table("gs_cat").select("id").as[Long].collect().sorted
        .toSeq == (1L to 6L))
    } finally q.stop()
  }

  test("readChangeFeed streams tagged inserts AND deletes; feed telescopes") {
    val root = tmpDir("gs-cdf")
    val store = new TableStore(spark, root)
    store.create("f", (1 to 6).map(i => (i.toLong, "a")).toDF("id", "g"))
    val q = spark.readStream.format("graft")
      .option("root", root).option("table", "f")
      .option("readChangeFeed", "true").load()
      .writeStream.format("memory").queryName("gs_cdf")
      .option("checkpointLocation", tmpDir("gs-cdf-ck")).start()
    try {
      q.processAllAvailable()
      // the initial snapshot is all-inserts at the start version
      assert(spark.table("gs_cdf").count() == 6)
      assert(spark.table("gs_cdf").select("_change_type").distinct()
        .as[String].collect().toSeq == Seq("insert"))
      // a delete commit FLOWS as tagged rows instead of failing
      store.deleteWhere("f", col("id") <= 2L)
      store.append("f", Seq((7L, "b")).toDF("id", "g"))
      q.processAllAvailable()
      val feed = spark.table("gs_cdf")
        .select("id", "_change_type").as[(Long, String)].collect().toSeq
      assert(feed.count(_._2 == "delete") == 2)
      // telescoping: snapshot + inserts − deletes == current table
      val replayed = feed.filter(_._2 == "insert").map(_._1)
        .diff(feed.filter(_._2 == "delete").map(_._1)).sorted
      assert(replayed == store.read("f").select("id").as[Long]
        .collect().sorted.toSeq)
    } finally q.stop()
  }

  test("a startingVersion replay across ALTER ADD COLUMNS backfills NULL") {
    val root = tmpDir("gs-evo")
    val store = new TableStore(spark, root)
    store.create("e", Seq((1L, "a")).toDF("id", "s"))            // v0
    graft.lake.GraftSql.execute(spark, store,
      "ALTER TABLE e ADD COLUMNS (x DOUBLE)")                    // v1
    store.append("e", Seq((2L, "b", 1.5)).toDF("id", "s", "x"))  // v2
    // the stream starts AFTER the evolution, so its schema has x;
    // the pre-evolution commit must serve with x backfilled NULL
    // (the store read's union-by-name semantic), not fail the select
    val q = spark.readStream.format("graft")
      .option("root", root).option("table", "e")
      .option("startingVersion", "0").load()
      .writeStream.format("memory").queryName("gs_evo")
      .option("checkpointLocation", tmpDir("gs-evo-ck")).start()
    try {
      q.processAllAvailable()
      val got = spark.table("gs_evo").orderBy("id")
        .as[(Long, String, Option[Double])].collect().toSeq
      assert(got == Seq((1L, "a", None), (2L, "b", Some(1.5))))
    } finally q.stop()
  }

  test("refusals: MV source, missing sink table, update mode, partitionBy") {
    val root = tmpDir("gs-ref")
    val store = new TableStore(spark, root)
    store.create("base", Seq((1L, "a", 2.0)).toDF("id", "g", "v"))
    graft.lake.MaterializedView.create(store, "base_mv", "base",
      Seq("g"), Seq("v"))
    val e1 = intercept[Exception] {
      val q = spark.readStream.format("graft")
        .option("root", root).option("table", "base_mv").load()
        .writeStream.format("memory").queryName("gs_mv")
        .option("checkpointLocation", tmpDir("gs-ref-ck")).start()
      drain(q)
    }
    assert(Iterator.iterate(e1: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("materialized view"))))
    val in = spark.readStream.format("graft")
      .option("root", root).option("table", "base").load()
    val e2 = intercept[Exception] {
      val q = in.writeStream.format("graft")
        .option("root", root).option("table", "nope")
        .option("checkpointLocation", tmpDir("gs-ref-ck2")).start()
      drain(q)
    }
    // the DSv2 probe ahead of the V1 sink fallback already refuses
    // the unknown table at start() (TABLE_OR_VIEW_NOT_FOUND); the
    // sink's own addBatch guard is the backstop wording
    assert(Iterator.iterate(e2: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(m =>
        m.contains("does not exist") || m.contains("cannot be found") ||
          m.contains("TABLE_OR_VIEW_NOT_FOUND"))))
    val e3 = intercept[Exception] {
      in.writeStream.format("graft").outputMode("update")
        .option("root", root).option("table", "base")
        .option("checkpointLocation", tmpDir("gs-ref-ck3")).start()
    }
    assert(Iterator.iterate(e3: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(m =>
        m.contains("Append and Complete") || m.contains("Update"))))
    // streaming INTO a materialized view would corrupt the partial
    // algebra — refused per batch
    val e4 = intercept[Exception] {
      val q = in.writeStream.format("graft")
        .option("root", root).option("table", "base_mv")
        .option("checkpointLocation", tmpDir("gs-ref-ck4")).start()
      drain(q)
    }
    assert(Iterator.iterate(e4: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("materialized view"))))
  }
}
