package graft.streaming

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.functions._

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docA = "the quick brown fox jumps over the lazy dog again and again"
  private val docB = "completely different content about spark engines and parquet files"

  test("row-wise signatures equal the batch aggregation signatures") {
    val docs = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    val row = StreamingDedup.rowwiseSignatures(docs, "doc_id", "text", 3, 8)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    val agg = Dedup.minhashSignatures(docs, "doc_id", "text", 3, 8)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    assert(row.toSeq == agg.toSeq)
  }

  test("repetition metrics: stream output equals batch on the same rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.TextOps
    implicit val sql = spark.sqlContext
    val rows = Seq((1L, "a b a b a"), (2L, "x y z x q r s"), (3L, "c c c c"))
    val in = MemoryStream[(Long, String)]
    val q = TextOps
      .repetitionMetrics(in.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("rep_out")
      .outputMode("append").start()
    try {
      in.addData(rows.take(2): _*)
      q.processAllAvailable()
      in.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val stream = spark.table("rep_out").orderBy("doc_id").collect().toSeq
      val batch = TextOps
        .repetitionMetrics(rows.toDF("doc_id", "text"), "doc_id", "text")
        .orderBy("doc_id").collect().toSeq
      assert(stream == batch)
    } finally q.stop()
  }

  test("streaming candidates: a near-dup arriving later pairs with the original") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val q = StreamingDedup.nearDupCandidates(docs, "doc_id", "text")
      .writeStream.format("memory").queryName("cand_out")
      .outputMode("append").start()
    try {
      in.addData((1L, docA), (2L, docB))
      q.processAllAvailable()
      // nothing similar seen yet
      assert(spark.table("cand_out").count() == 0)
      // an exact dup of doc 1 arrives in a later batch
      in.addData((3L, docA))
      q.processAllAvailable()
      val pairs = spark.table("cand_out")
        .select("a", "b").as[(Long, Long)].collect().toSet
      assert(pairs == Set((1L, 3L)))
    } finally q.stop()
  }

  test("streaming perceptual candidates: a brightness-shifted copy arriving later pairs up") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.Multimodal
    implicit val sql = spark.sqlContext
    def img(seed: Long, shift: Int): Array[Byte] = {
      val px = new Array[Byte](18 * 16 * 3)
      for (y <- 0 until 16; x <- 0 until 18) {
        val g = ((seed * 31 + x * 7 + y * 13) % 200 + shift).toInt
        val o = (y * 18 + x) * 3
        px(o) = g.toByte; px(o + 1) = g.toByte; px(o + 2) = g.toByte
      }
      Multimodal.encodePpm(18, 16, px)
    }
    val in = MemoryStream[(Long, String, Array[Byte])]
    val media = in.toDF().toDF("media_id", "format", "bytes")
    val q = StreamingDedup.perceptualCandidates(media)
      .writeStream.format("memory").queryName("ph_cand_out")
      .outputMode("append").start()
    try {
      in.addData((1L, "ppm", img(42L, 0)), (2L, "ppm", img(999L, 0)))
      q.processAllAvailable()
      assert(spark.table("ph_cand_out").count() == 0) // nothing alike yet
      // a +20-brightness copy of image 1 arrives in a later batch
      in.addData((3L, "ppm", img(42L, 20)))
      q.processAllAvailable()
      val pairs = spark.table("ph_cand_out")
        .select("a", "b").as[(Long, Long)].collect().toSet
      assert(pairs == Set((1L, 3L)),
        s"want exactly the shifted copy as a candidate, got $pairs")
    } finally q.stop()
  }

  test("band-index ingest: pairs accumulate durably across micro-batches") {
    val src = tmpDir("bands-src")
    val store = new graft.lake.TableStore(spark, tmpDir("bands-store"))
    // batch 1 lands before the stream starts
    Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(src)
    val q = StreamingDedup.startBandIndexIngest(spark, src, store, "bands",
      "doc_id", "text", checkpointDir = Some(tmpDir("bands-ckpt")))
    try {
      q.processAllAvailable()
      assert(store.exists("bands"))
      assert(store.read("bands_pairs").count() == 0) // nothing similar yet
      // a near-copy of doc 1 arrives later; found against the INDEX,
      // not by recomputing batch-1 signatures
      Seq((3L, docA)).toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(src)
      q.processAllAvailable()
      val pairs = store.read("bands_pairs")
        .select("a", "b").as[(Long, Long)].collect().toSet
      assert(pairs == Set((1L, 3L)))
      // the index itself carries all three docs for future batches
      assert(store.read("bands").select("doc_id").distinct().count() == 3)
    } finally q.stop()
  }

  test("appendBatchOnce skips a replayed micro-batch (at-least-once -> exactly-once)") {
    val store = new graft.lake.TableStore(spark, tmpDir("once-store"))
    val rows = Seq((1L, "x")).toDF("id", "v")
    StreamingDedup.appendBatchOnce(store, "t", 0L, rows)
    StreamingDedup.appendBatchOnce(store, "t", 0L, rows) // crash-replay of batch 0
    StreamingDedup.appendBatchOnce(store, "t", 1L, rows)
    val byBatch = store.read("t").groupBy("__batch_id").count()
      .as[(Long, Long)].collect().toMap
    assert(byBatch == Map(0L -> 1L, 1L -> 1L))
  }

  test("bucket cap stops admitting members instead of growing state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    // cap 2: ids 1,2 admitted; 3 rejected -> only pair (1,2) ever emitted
    val q = StreamingDedup.nearDupCandidates(docs, "doc_id", "text",
        maxBucket = 2)
      .writeStream.format("memory").queryName("cand_cap_out")
      .outputMode("append").start()
    try {
      in.addData((1L, docA), (2L, docA))
      q.processAllAvailable()
      in.addData((3L, docA))
      q.processAllAvailable()
      val pairs = spark.table("cand_cap_out")
        .select("a", "b").as[(Long, Long)].collect().toSet
      assert(pairs == Set((1L, 2L)))
    } finally q.stop()
  }
}
