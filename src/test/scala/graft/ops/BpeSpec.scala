package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic BPE: training, segmentation, the vocab-bounded
  * distributed budget, and stream==batch for the streaming count. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("training is deterministic and independent of input order") {
    val m1 = Bpe.train(corpus, 10)
    val m2 = Bpe.train(corpus.reverse, 10)
    val m3 = Bpe.train(scala.util.Random.shuffle(corpus), 10)
    assert(m1 == m2 && m1 == m3 && m1.nonEmpty)
  }

  test("segmentation reconstructs the word and shrinks as merges grow") {
    val merges = Bpe.train(corpus, 12)
    val ranks = merges.zipWithIndex.toMap
    for (w <- Seq("low", "newest", "lowest", "wildest")) {
      val pieces = Bpe.segment(w, ranks)
      // pieces concatenate back to the word (sentinel stripped)
      assert(pieces.mkString.replace("\u0017", "") == w, s"$w -> $pieces")
      assert(pieces.nonEmpty && pieces.size <= w.length + 1)
    }
    // more merges never yield more pieces for in-corpus words
    val few = Bpe.train(corpus, 2).zipWithIndex.toMap
    for (w <- corpus.map(_._1))
      assert(Bpe.segment(w, ranks).size <= Bpe.segment(w, few).size)
    // a frequent corpus word collapses far below its char count
    assert(Bpe.segment("newest", ranks).size < "newest".length)
  }

  test("unseen words segment safely; empty word is zero pieces") {
    val ranks = Bpe.train(corpus, 8).zipWithIndex.toMap
    assert(Bpe.segment("zzz", ranks).size == 3) // no merge applies
    assert(Bpe.segment("", ranks).isEmpty)
  }

  test("tokenBudget equals the brute-force per-doc segmentation sum") {
    val docs = Seq(
      (1L, "a", "low lower newest"),
      (2L, "a", "widest low"),
      (3L, "b", "newest newest wildest")).toDF("doc_id", "source", "text")
    val merges = Bpe.trainFromCorpus(docs, "text", numMerges = 8)
    val got = Bpe.tokenBudget(docs, "text", "source", merges)
      .select("source", "docs", "pre_tokens", "bpe_pieces")
      .orderBy("source")
      .as[(String, Long, Long, Long)].collect().toSeq
    val ranks = merges.zipWithIndex.toMap
    def brute(texts: Seq[String]): (Long, Long) = {
      val toks = texts.flatMap(t =>
        TextOps.bpePattern.r.findAllIn(t).toSeq)
      (toks.size.toLong, toks.map(Bpe.segment(_, ranks).size.toLong).sum)
    }
    val a = brute(Seq("low lower newest", "widest low"))
    val b = brute(Seq("newest newest wildest"))
    assert(got == Seq(("a", 2L, a._1, a._2), ("b", 1L, b._1, b._2)))
  }

  test("corpus-wide training is partition-layout independent; cap is deterministic") {
    val docs = (1L to 40L).map(i =>
      (i, "s" + (i % 3), s"low lower newest tok$i low"))
      .toDF("doc_id", "source", "text")
    val one = Bpe.trainFromCorpus(docs.coalesce(1), "text", numMerges = 12)
    val many = Bpe.trainFromCorpus(docs.repartition(7), "text", numMerges = 12)
    assert(one == many && one.nonEmpty)
    // the top-|V| cap keeps the FREQUENT head: training under a tight
    // cap still learns the dominant words' merges
    val capped = Bpe.trainFromCorpus(docs, "text", numMerges = 12, maxWords = 4)
    val ranks = capped.zipWithIndex.toMap
    assert(Bpe.segment("low", ranks).size < "low".length + 1)
  }

  test("a group of only empty/whitespace docs still reports, at zero") {
    val docs = Seq(
      (1L, "a", "low lower"),
      (2L, "b", "   "),
      (3L, "b", "")).toDF("doc_id", "source", "text")
    val merges = Bpe.trainFromCorpus(docs, "text", numMerges = 4)
    val got = Bpe.tokenBudget(docs, "text", "source", merges)
      .select("source", "docs", "pre_tokens", "bpe_pieces")
      .orderBy("source")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq("a", "b"))
    assert(got(1) == (("b", 2L, 0L, 0L)),
      "zero-pre-token groups must not vanish from the budget report")
  }

  test("stream == batch: micro-batched corpus reaches the same budget") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (1L, "a", "low lower newest"),
      (2L, "a", "widest low"),
      (3L, "b", "newest newest wildest"),
      (4L, "b", "low wide new"))
    val batchDf = rows.toDF("doc_id", "source", "text")
    val merges = Bpe.trainFromCorpus(batchDf, "text", numMerges = 8)
    val want = Bpe.tokenBudget(batchDf, "text", "source", merges)
      .select("source", "pre_tokens", "bpe_pieces")
      .orderBy("source").as[(String, Long, Long)].collect().toSeq

    // the broadcast merge table applies identically per micro-batch;
    // the running aggregate converges to the batch result
    val vocabLess = { // per-row pieces via the same segment worker
      val bc = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
      udf((text: String) => {
        val toks = TextOps.bpePattern.r.findAllIn(text).toSeq
        (toks.size.toLong, toks.map(Bpe.segment(_, bc.value).size.toLong).sum)
      })
    }
    val in = MemoryStream[(Long, String, String)]
    val agg = in.toDS().toDF("doc_id", "source", "text")
      .withColumn("c", vocabLess(col("text")))
      .groupBy("source")
      .agg(sum(col("c._1")).as("pre_tokens"), sum(col("c._2")).as("bpe_pieces"))
    val q = agg.writeStream.format("memory").queryName("bpe_budget")
      .outputMode("complete").start()
    try {
      in.addData(rows.take(2)); q.processAllAvailable()
      in.addData(rows.drop(2)); q.processAllAvailable()
      val got = spark.table("bpe_budget").orderBy("source")
        .as[(String, Long, Long)].collect().toSeq
      assert(got == want)
    } finally q.stop()
  }

  test("piece-id shards round-trip: pack by real counts, store, decode") {
    val texts = Seq(
      (1L, "low lower newest"),
      (2L, "widest low"),
      (3L, ""), // empty doc must keep a row with an empty sequence
      (4L, "newest newest wildest"))
    val docs = texts.toDF("doc_id", "text")
    val merges = Bpe.trainFromCorpus(docs, "text", numMerges = 8)
    val pid = Bpe.pieceIdMap(docs, "text", merges)
    val ids = Bpe.docPieceIds(docs, "doc_id", "text", merges, pid.toMap)
    assert(ids.count() == 4)
    // pack by the REAL piece-id counts (not the whitespace
    // approximation) and ship the shards through the store
    val packed = TextOps.packSequencesByCount(ids, "doc_id",
      size(col("piece_ids")), budget = 8, streamCols = Seq(lit(1)))
    val store = new graft.lake.TableStore(spark, tmpDir("bpe-shards"))
    store.create("shards", packed.select("doc_id", "piece_ids", "pack_id"),
      partitionBy = Seq("pack_id"))
    // read back and DECODE: ids -> pieces -> concatenation equals the
    // doc's pre-token stream — the reconstruction property proven
    // through the storage round-trip (re-segmenting a shard is a
    // no-op)
    val rev = pid.map(_.swap).toMap
    val back = store.read("shards").select("doc_id", "piece_ids")
      .as[(Long, Seq[Int])].collect().toMap
    val ranks = merges.zipWithIndex.toMap
    for ((docId, text) <- texts) {
      val toks = TextOps.bpePattern.r.findAllIn(text).toSeq
      val expect = toks.flatMap(Bpe.segment(_, ranks))
      val decoded = back(docId).map(rev)
      assert(decoded == expect, s"doc $docId: $decoded != $expect")
      assert(decoded.mkString.replace("\u0017", "") == toks.mkString)
    }
    // pack offsets follow the real counts: pack_id = start_off div 8
    val offs = packed.select("doc_id", "n_tokens", "start_off", "pack_id")
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
    assert(offs.map(_._2).sum ==
      back.values.map(_.size.toLong).sum)
    offs.foreach { case (_, _, off, pk) => assert(pk == off / 8) }
  }
}
