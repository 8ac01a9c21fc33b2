package graft.streaming

import graft.SparkSpec
import graft.lake.TableStore
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  private def cdcBatch(rows: (String, String, String)*) =
    rows.toSeq.toDF("key", "ts_str", "op")
      .withColumn("process_date", col("ts_str").cast("timestamp"))
      .drop("ts_str")

  test("streaming CDC upsert: micro-batches reach the same table state") {
    val src = tmpDir("stream-src")
    val store = new TableStore(spark, tmpDir("stream-store"))
    // batch 1 lands before the stream starts
    cdcBatch(
      ("k1", "2024-01-01 10:00:00", "I"),
      ("k2", "2024-01-01 10:30:00", "I"))
      .coalesce(1).write.mode("append").parquet(src)

    val q = StreamingIngest.start(spark, src, store, "t",
      checkpointDir = Some(tmpDir("stream-ckpt")))
    try {
      q.processAllAvailable()
      assert(store.read("t").select("key").as[String].collect().sorted
        .toSeq == Seq("k1", "k2"))

      // batch 2: update k1, delete k2, insert k3
      cdcBatch(
        ("k1", "2024-01-02 10:00:00", "U"),
        ("k2", "2024-01-02 10:00:00", "D"),
        ("k3", "2024-01-02 10:00:00", "I"))
        .coalesce(1).write.mode("append").parquet(src)
      q.processAllAvailable()
      assert(store.read("t").select("key").as[String].collect().sorted
        .toSeq == Seq("k1", "k3"))
    } finally q.stop()
  }

  test("streaming ingest conforms a drifted landing batch through the contract") {
    import org.apache.spark.sql.types._
    val src = tmpDir("stream-drift-src")
    val store = new TableStore(spark, tmpDir("stream-drift-store"))
    // the landing generation drifted: process_date ships as a STRING
    // wall clock (the §7.7.1 trap) and key as an int
    Seq((1, "2024-01-01 10:00:00", "I"), (2, "2024-01-01 11:00:00", "I"))
      .toDF("key", "process_date", "op")
      .coalesce(1).write.mode("append").parquet(src)
    val q = StreamingIngest.start(spark, src, store, "td",
      checkpointDir = Some(tmpDir("stream-drift-ckpt")),
      contract = Map("key" -> LongType, "process_date" -> TimestampType))
    try {
      q.processAllAvailable()
      val t = store.read("td")
      assert(t.schema("key").dataType == LongType)
      assert(t.schema("process_date").dataType == TimestampType)
      assert(t.select("key").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
      // a second drifted batch still flows, and the watermark filter
      // (which needs a real timestamp) admits only the newer row
      Seq((1, "2024-01-02 10:00:00", "U"), (2, "2023-12-01 10:00:00", "U"))
        .toDF("key", "process_date", "op")
        .coalesce(1).write.mode("append").parquet(src)
      q.processAllAvailable()
      val rows = store.read("td")
        .select(col("key"), col("process_date").cast("string"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows(1L).startsWith("2024-01-02"), s"update lost: $rows")
      assert(rows(2L).startsWith("2024-01-01"), s"stale row won: $rows")
    } finally q.stop()
  }

  test("stateful dedup keeps latest per key across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamingIngest.KeyedRec
    implicit val sql = spark.sqlContext
    val in = MemoryStream[KeyedRec]
    val q = StreamingIngest.statefulDedupLatest(in.toDS())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("update").start()
    try {
      in.addData(KeyedRec(1L, 10L, "I", 1.0), KeyedRec(2L, 10L, "I", 2.0))
      q.processAllAvailable()
      // batch 2: newer k1 update wins; k2 tombstoned; stale k1 ignored
      in.addData(KeyedRec(1L, 20L, "U", 9.0), KeyedRec(1L, 5L, "U", 0.5),
        KeyedRec(2L, 20L, "D", 0.0))
      q.processAllAvailable()
      val out = spark.table("dedup_out").as[KeyedRec].collect().toSeq
      // emissions: both initial inserts, then the k1 update only
      assert(out.count(_.key == 1L) == 2 && out.count(_.key == 2L) == 1)
      assert(out.filter(_.key == 1L).map(_.ts).max == 20L)
      // batch 3: older-than-state record must NOT re-emit, and a late
      // record older than a delete must NOT resurrect the deleted key
      in.addData(KeyedRec(1L, 15L, "U", 4.0), KeyedRec(2L, 15L, "U", 5.0))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == out.size)
    } finally q.stop()
  }

  test("state TTL: a timed-out tombstone re-admits late data") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamingIngest.KeyedRec
    implicit val sql = spark.sqlContext
    val in = MemoryStream[KeyedRec]
    // ProcessingTimeTimeout forces a batch every trigger (the timeout
    // sweep), so noNewData never latches and processAllAvailable would
    // block forever — poll progress/results with a deadline instead.
    val q = StreamingIngest.statefulDedupLatest(in.toDS(),
        stateTtl = Some("50 milliseconds"))
      .writeStream.format("memory").queryName("dedup_ttl_out")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
      .start()
    def awaitUntil(what: String)(pred: => Boolean): Unit = {
      val deadline = System.currentTimeMillis + 30000
      while (!pred && System.currentTimeMillis < deadline) Thread.sleep(100)
      assert(pred, s"timed out waiting for $what")
    }
    try {
      in.addData(KeyedRec(2L, 20L, "D", 0.0))
      awaitUntil("tombstone batch")(
        q.recentProgress.map(_.numInputRows).sum >= 1)
      assert(spark.table("dedup_ttl_out").count() == 0)
      // let the TTL lapse; the per-trigger sweep expires the tombstone
      Thread.sleep(500)
      // late record OLDER than the delete: with the tombstone expired,
      // it is re-admitted — the documented TTL trade-off
      in.addData(KeyedRec(2L, 15L, "U", 5.0))
      awaitUntil("re-admitted late record")(
        spark.table("dedup_ttl_out").as[KeyedRec].collect()
          .exists(r => r.key == 2L && r.ts == 15L))
    } finally q.stop()
  }

  test("session windows merge events within the gap, split beyond it") {
    val events = Seq(
      (7L, "2024-01-01 10:00:00"), (7L, "2024-01-01 10:10:00"),
      (7L, "2024-01-01 11:00:00"), // > 30 min after the previous
      (8L, "2024-01-01 10:05:00"))
      .toDF("user_id", "ts_str")
      .withColumn("ts", col("ts_str").cast("timestamp"))
    val out = StreamingIngest.sessionCounts(events, "user_id", "ts",
        gap = "30 minutes", watermark = "1 hour")
      .select(col("user_id"), col("sess_start").cast("string"), col("n_events"))
      .orderBy("user_id", "sess_start")
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq(
      (7L, "2024-01-01 10:00:00", 2L), // 10:00+10:10 merged
      (7L, "2024-01-01 11:00:00", 1L), // split by the gap
      (8L, "2024-01-01 10:05:00", 1L)))
  }

  test("windowed counts: a real stream converges to the batch result") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val rows = Seq(
      ("2024-01-01 10:01:00", "click", 1.0),
      ("2024-01-01 10:04:00", "click", 2.0),
      ("2024-01-01 10:06:00", "view", 3.0),
      ("2024-01-01 10:03:30", "view", 0.5), // late, within watermark
      ("2024-01-01 10:11:00", "click", 4.0))
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select(col("window.start").cast("string").as("start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("start", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3))).toSeq
    val in = MemoryStream[(String, String, Double)]
    val stream = in.toDF().toDF("ts_str", "event_type", "value")
      .withColumn("ts", col("ts_str").cast("timestamp"))
    val q = StreamingIngest.windowedCounts(stream, "ts", "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("wc_stream")
      .outputMode("complete").start()
    try {
      // two micro-batches with the late row split across them
      in.addData(rows.take(3): _*)
      q.processAllAvailable()
      in.addData(rows.drop(3): _*)
      q.processAllAvailable()
      val streamed = shape(spark.table("wc_stream"))
      val batch = shape(StreamingIngest.windowedCounts(
        rows.toDF("ts_str", "event_type", "value")
          .withColumn("ts", col("ts_str").cast("timestamp")),
        "ts", "5 minutes", "10 minutes"))
      // the operator the oracle-checked batch query pins IS what the
      // stream computes
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("stream-static enrichment joins each micro-batch against the broadcast dim") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val rows = Seq((1L, "click"), (2L, "view"), (9L, "click")) // 9 has no dim row
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("event_type"), col("tier"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)))).toSeq
    val in = MemoryStream[(Long, String)]
    val q = StreamingIngest.enrichWithDim(
        in.toDF().toDF("user_id", "event_type"), dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enrich_stream")
      .outputMode("append").start()
    try {
      in.addData(rows.take(2): _*)
      q.processAllAvailable()
      in.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val streamed = shape(spark.table("enrich_stream"))
      val batch = shape(StreamingIngest.enrichWithDim(
        rows.toDF("user_id", "event_type"), dim, Seq("user_id")))
      assert(streamed == batch)
      // the unmatched stream row survives with NULL enrichment
      assert(streamed.contains((9L, "click", None)))
    } finally q.stop()
  }

  test("stream-stream time-band join matches the batch join; out-of-band pairs drop") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    // impressions ⋈ clicks on ad_id, click within 10 minutes after
    val imps = Seq((1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 10:02:00"),
      (3L, "2024-01-01 10:30:00"))
    val clicks = Seq((1L, "2024-01-01 10:05:00"), // in band
      (2L, "2024-01-01 10:20:00"),                // 18 min after: out of band
      (3L, "2024-01-01 10:29:00"),                // before the impression
      (1L, "2024-01-01 10:09:00"))                // second in-band click
    def impShape(df: org.apache.spark.sql.DataFrame) = df
      .select(col("s").cast("timestamp").as("imp_ts"), col("ad_id"))
    def clkShape(df: org.apache.spark.sql.DataFrame) = df
      .select(col("s").cast("timestamp").as("clk_ts"), col("ad_id"))
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select(col("ad_id"), col("imp_ts").cast("string"),
        col("clk_ts").cast("string"))
      .orderBy("ad_id", "clk_ts")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val inI = MemoryStream[(Long, String)]
    val inC = MemoryStream[(Long, String)]
    val q = StreamingIngest.streamStreamJoin(
        impShape(inI.toDF().toDF("ad_id", "s")),
        clkShape(inC.toDF().toDF("ad_id", "s")),
        "ad_id", "imp_ts", "clk_ts", "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName("ssj_stream")
      .outputMode("append").start()
    try {
      inI.addData(imps.take(2): _*); inC.addData(clicks.take(2): _*)
      q.processAllAvailable()
      inI.addData(imps.drop(2): _*); inC.addData(clicks.drop(2): _*)
      q.processAllAvailable()
      val streamed = shape(spark.table("ssj_stream"))
      val batch = shape(StreamingIngest.streamStreamJoin(
        impShape(imps.toDF("ad_id", "s")), clkShape(clicks.toDF("ad_id", "s")),
        "ad_id", "imp_ts", "clk_ts", "10 minutes", "30 minutes"))
      assert(streamed == batch && streamed.nonEmpty)
      // only ad 1's two in-band clicks match; 2's late and 3's early drop
      assert(streamed.map(_._1).toSet == Set(1L) && streamed.size == 2)
    } finally q.stop()
  }

  test("windowed counts with watermark over bounded events input") {
    val events = Seq(
      (1L, "2024-01-01 10:01:00", "click", 1.0),
      (2L, "2024-01-01 10:04:00", "click", 2.0),
      (3L, "2024-01-01 10:06:00", "view", 3.0))
      .toDF("event_id", "ts_str", "event_type", "value")
      .withColumn("ts", col("ts_str").cast("timestamp"))
    val out = StreamingIngest.windowedCounts(events, "ts", "5 minutes", "10 minutes")
      .select(col("window.start").cast("string").as("start"),
        col("event_type"), col("n"))
      .orderBy("start", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("2024-01-01 10:00:00", "click", 2L),
      ("2024-01-01 10:05:00", "view", 1L)))
  }
}
