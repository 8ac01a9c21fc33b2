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

  /** Deterministic 18×16 test image: gray(x,y) = f(seed,x,y), all
    * channels equal, values kept ≤ 219 so a +brightness shift never
    * clips. */
  private def img(seed: Long, shift: Int): Array[Byte] = {
    val px = new Array[Byte](18 * 16 * 3)
    for (y <- 0 until 16; x <- 0 until 18) {
      val g = ((seed * 31 + x * 7 + y * 13) % 200 + shift).toInt
      val o = (y * 18 + x) * 3
      px(o) = g.toByte; px(o + 1) = g.toByte; px(o + 2) = g.toByte
    }
    Multimodal.encodePpm(18, 16, px)
  }

  test("decodePpmGray pools exactly on an integer downscale") {
    val g = Multimodal.decodePpmGray(img(7L, 0), 9, 8).get
    assert(g.length == 72)
    def f(x: Int, y: Int) = (7L * 31 + x * 7 + y * 13) % 200
    for (r <- 0 until 8; c <- 0 until 9) {
      val want = (f(2 * c, 2 * r) + f(2 * c + 1, 2 * r) +
        f(2 * c, 2 * r + 1) + f(2 * c + 1, 2 * r + 1)) / 4.0
      assert(g(r * 9 + c) == want, s"cell ($r,$c)")
    }
    // sub-grid images refuse rather than divide by zero
    assert(Multimodal.decodePpmGray(
      Multimodal.encodePpm(4, 4, Array.fill(48)(1.toByte)), 9, 8).isEmpty)
  }

  test("perceptual near-dup: a brightness-shifted copy is caught, an unrelated image is not") {
    val media = Seq(
      (1L, "ppm", img(42L, 0)),
      (2L, "ppm", img(42L, 20)),  // same image, +20 brightness
      (3L, "ppm", img(999L, 0)))  // unrelated content
      .toDF("media_id", "format", "bytes")
    val hashes = Multimodal.perceptualHashes(spark, media).toDF()
    val pairs = Multimodal.perceptualNearDup(hashes, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0L)),
      s"want exactly the shifted copy at distance 0, got ${pairs.toSeq}")
  }

  test("banding recall: a pair at Hamming distance 3 still meets in a band") {
    val (hi, lo) = Multimodal.dHashOf(
      Multimodal.decodePpmGray(img(5L, 0), 9, 8).get)
    // flip 3 bits spread across three different bands — pigeonhole
    // leaves the fourth band identical, so the equi-join must find it
    val hi2 = hi ^ (1L << 3) ^ (1L << 19)
    val lo2 = lo ^ (1L << 5)
    val hashes = Seq((1L, hi, lo), (2L, hi2, lo2))
      .toDF("media_id", "hash_hi", "hash_lo")
    val pairs = Multimodal.perceptualNearDup(hashes, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 3L)))
  }

  test("hot perceptual-hash buckets are dropped, never joined all-pairs") {
    // 30 flat images hash identically (all-zero gradient): with the
    // bucket cap below that count, no candidate pair survives
    val flat = (1L to 30L).map(i => (i, "ppm",
      Multimodal.encodePpm(18, 16, Array.fill(18 * 16 * 3)(100.toByte))))
      .toDF("media_id", "format", "bytes")
    val hashes = Multimodal.perceptualHashes(spark, flat).toDF()
    val pairs = Multimodal.perceptualNearDup(hashes, maxDist = 3,
      maxBucketDf = 10)
    assert(pairs.count() == 0)
  }
}
