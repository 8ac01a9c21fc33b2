package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def chunkHashes(text: String): Set[String] =
    TextOps.cdcChunks(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", divisor = 8)
      .select("chunk_hash").as[String].collect().toSet

  test("identical documents produce identical chunk sets") {
    val t = (1 to 100).map(i => s"tok${i * 37 % 91}").mkString(" ")
    assert(chunkHashes(t) == chunkHashes(t))
  }

  test("a prefix insertion only disturbs chunks before the next boundary") {
    // content-defined property: boundaries move WITH the content, so
    // everything after the first boundary past the edit re-aligns
    val base = (1 to 200).map(i => s"tok${i * 37 % 91}").mkString(" ")
    val edited = "inserted words here " + base
    val a = chunkHashes(base)
    val b = chunkHashes(edited)
    val shared = a.intersect(b).size.toDouble
    assert(shared / a.size > 0.5,
      s"only $shared of ${a.size} chunks survived a prefix edit")
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("frameSample cuts evenly-strided fixed-width windows") {
    // 26-byte payload, 3 frames of 8: stride = (26-8)/2 = 9
    val media = Seq((1L, "fmt0", "abcdefghijklmnopqrstuvwxyz".getBytes("UTF-8")))
      .toDF("media_id", "format", "bytes")
    val out = Multimodal.frameSample(media, frameCount = 3, frameLen = 8)
      .select(col("frame_idx"), col("start"),
        decode(col("frame"), "UTF-8").as("f"))
      .orderBy("frame_idx")
      .as[(Int, Long, String)].collect().toSeq
    assert(out == Seq(
      (0, 1L, "abcdefgh"),
      (1, 10L, "jklmnopq"),
      (2, 19L, "stuvwxyz")))
  }

  test("frameSample on a payload shorter than a frame yields the remainder") {
    val media = Seq((1L, "fmt0", "abc".getBytes("UTF-8")))
      .toDF("media_id", "format", "bytes")
    val out = Multimodal.frameSample(media, frameCount = 3, frameLen = 8)
      .select(col("frame_idx"), col("start"),
        decode(col("frame"), "UTF-8").as("f"))
      .orderBy("frame_idx")
      .as[(Int, Long, String)].collect().toSeq
    // stride clamps to 1: starts 1,2,3 -> suffixes (exact row list, so
    // a duplicate-emitting regression fails)
    assert(out == Seq((0, 1L, "abc"), (1, 2L, "bc"), (2, 3L, "c")))
  }
}
