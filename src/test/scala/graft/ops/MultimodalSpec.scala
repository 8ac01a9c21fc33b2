package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

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
