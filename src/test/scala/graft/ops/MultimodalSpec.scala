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

  test("blockNearDup pairs payloads by shared-block fraction, equi-join only") {
    import org.apache.spark.sql.functions._
    // 4-byte blocks; A and B share their first 8 bytes (2 blocks of 4),
    // C is disjoint. A has 3 blocks, B has 3: shared 2 / min 3 = 0.667
    val media = Seq(
      (1L, "AAAABBBBCCCC"), (2L, "AAAABBBBDDDD"), (3L, "EEEEFFFFGGGG"))
      .toDF("media_id", "txt")
      .select(col("media_id"), lit("fmt0").as("format"),
        encode(col("txt"), "UTF-8").as("bytes"))
    val pairs = Multimodal.blockNearDup(media, block = 4, minShared = 0.5)
      .select("a_id", "b_id", "shared").as[(Long, Long, Long)].collect()
    assert(pairs.toSeq == Seq((1L, 2L, 2L)))
    // below the threshold: nothing
    assert(Multimodal.blockNearDup(media, block = 4, minShared = 0.7).isEmpty)
    // no cartesian/BNL join in the plan — candidates come from the
    // block-hash equi-join
    val plan = Multimodal.blockNearDup(media, 4, 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"),
      s"all-pairs shape leaked into the plan:\n$plan")
  }

  test("decodePpm decodes real P6 bytes: dimensions, pixel means, comments") {
    // 2x2 image with known channel values
    val px = Array[Int](
      255, 0, 0,   0, 255, 0,
      0, 0, 255,   255, 255, 255).map(_.toByte)
    val img = Multimodal.encodePpm(2, 2, px)
    val Some((w, h, means)) = Multimodal.decodePpm(img)
    assert(w == 2 && h == 2)
    // r: (255+0+0+255)/4, g: (0+255+0+255)/4, b: (0+0+255+255)/4
    assert(means.toSeq == Seq(127.5, 127.5, 127.5))
    // comments and flexible whitespace in the header parse per spec
    val commented = ("P6\n# a comment\n2 2\n# another\n255\n"
      .getBytes("US-ASCII")) ++ px
    val Some((cw, ch, cMeans)) = Multimodal.decodePpm(commented)
    assert(cw == 2 && ch == 2 && cMeans.toSeq == means.toSeq)
    // malformed payloads drop, never throw
    assert(Multimodal.decodePpm("P5\n2 2\n255\n".getBytes ++ px).isEmpty)
    assert(Multimodal.decodePpm(img.dropRight(3)).isEmpty) // truncated pixels
    assert(Multimodal.decodePpm("P6\n2 2\n65535\n".getBytes ++ px).isEmpty)
    assert(Multimodal.decodePpm(Array.empty[Byte]).isEmpty)
  }

  test("extractImageFeatures runs the REAL codec through the batch interface") {
    def gray(v: Int) = Array.fill(2 * 3 * 3)(v.toByte) // 2x3, all channels v
    val media = Seq(
      (1L, "ppm", Multimodal.encodePpm(2, 3, gray(10))),
      (2L, "ppm", Multimodal.encodePpm(2, 3, gray(200))),
      (3L, "bad", "not an image at all".getBytes("UTF-8")))
      .toDF("media_id", "format", "bytes")
      .repartition(3) // batches span partitions; payloads never collect
    val got = Multimodal.extractImageFeatures(spark, media)
      .collect().sortBy(_.media_id)
    assert(got.map(_.media_id).toSeq == Seq(1L, 2L)) // undecodable drops
    assert(got.forall(f => f.width == 2 && f.height == 3))
    assert(got.map(_.mean_r).toSeq == Seq(10.0, 200.0))
    assert(got.map(_.mean_g).toSeq == Seq(10.0, 200.0))
    assert(got.map(_.mean_b).toSeq == Seq(10.0, 200.0))
  }
}
