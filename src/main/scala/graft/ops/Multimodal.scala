package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column support (north-star extension): image/audio/video
  * as opaque `binary` columns plus typed metadata, with feature
  * extraction as batched per-partition functions — the Scala analogue
  * of `mapInPandas` (iterator-of-batches, no per-row JVM crossing).
  *
  * The container has no image/audio codec LIBRARIES, so `decodeStub`
  * is a clearly-marked DETERMINISTIC FAKE standing in for a native
  * decoder (libjpeg/ffmpeg behind a vectorized call) — but the batch
  * interface is exercised by a REAL codec too: [[decodePpm]] decodes
  * binary PPM (P6) images in pure JVM (header parse + every pixel),
  * through the identical `mapPartitions` shape
  * ([[extractImageFeatures]]). Everything else — the binary column,
  * metadata schema, partition-batched extraction shape, and the
  * feature aggregation — is the real plumbing a 100 TB multimodal
  * pipeline needs (binary payloads stay distributed; only fixed-width
  * features come back to columnar land).
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRow(media_id: Long, format: String, bytes: Array[Byte])

  /** Fixed-width features extracted per payload. */
  final case class MediaFeatures(media_id: Long, format: String,
      n_bytes: Long, head_sum: Long, tail_byte: Long)

  /** Derive a media table from `documents`: payload = UTF-8 bytes of
    * the text, format assigned round-robin. A real pipeline reads the
    * payloads from an object store; the schema is the same. */
  def deriveMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      concat(lit("fmt"), (col("doc_id") % 3).cast("string")).as("format"),
      encode(col("text"), "UTF-8").as("bytes"))

  /** STUB DECODER — deterministic fake for the absent native codec.
    * Real impl: decode image/audio, emit embeddings / dimensions /
    * frame samples. Signature and batch shape are the real thing. */
  private def decodeStub(bytes: Array[Byte]): (Long, Long, Long) = {
    val n = bytes.length.toLong
    val headSum = bytes.iterator.take(8).map(b => (b & 0xff).toLong).sum
    val tail = if (bytes.isEmpty) 0L else (bytes(bytes.length - 1) & 0xff).toLong
    (n, headSum, tail)
  }

  /** Batched per-partition feature extraction (mapPartitions = the
    * iterator-of-rows batch shape; stays distributed, no collect). */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { batch =>
      batch.map { row =>
        val (n, headSum, tail) = decodeStub(row.bytes)
        MediaFeatures(row.media_id, row.format, n, headSum, tail)
      }
    }
  }

  /** Per-image decoded features (REAL decode — see [[decodePpm]]). */
  final case class ImageFeatures(media_id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** REAL pure-JVM image decoder: binary PPM (P6) — magic, optional
    * `#` comments, width/height/maxval header, one whitespace, then
    * raw 8-bit RGB triplets. PPM needs no codec library, so unlike
    * [[decodeStub]] this is an honest decode path: it validates the
    * container and reads every pixel. Returns None on anything
    * malformed (wrong magic, 2-byte maxval, truncated pixel data) —
    * the real-pipeline behavior of dropping undecodable payloads
    * instead of failing the job. */
  def decodePpm(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] =
    parsePpmHeader(bytes).map { case (w, h, base) =>
      val n = w.toLong * h * 3
      val sums = new Array[Double](3)
      var p = 0
      while (p < n) {
        sums((p % 3).toInt) += (bytes(base + p.toInt) & 0xff)
        p += 1
      }
      val px = w.toDouble * h
      (w, h, sums.map(_ / px))
    }

  /** Validated P6 header: (width, height, pixel-data offset), or None
    * on anything malformed (wrong magic, 2-byte maxval, truncated
    * pixel data). Shared by every decode path. */
  private def parsePpmHeader(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    var i = 0
    def skipWs(): Unit = {
      var in = true
      while (in && i < bytes.length) {
        val c = bytes(i).toChar
        if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (c.isWhitespace) i += 1
        else in = false
      }
    }
    def int(): Option[Int] = {
      skipWs()
      val start = i
      while (i < bytes.length && (bytes(i) >= '0' && bytes(i) <= '9')) i += 1
      if (i == start || i - start > 9) None
      else Some(new String(bytes, start, i - start).toInt)
    }
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    i = 2
    for {
      w <- int(); h <- int(); maxval <- int()
      if w > 0 && h > 0 && maxval > 0 && maxval < 256
      // exactly ONE whitespace byte separates header from pixel data
      if i < bytes.length && bytes(i).toChar.isWhitespace
      n = w.toLong * h * 3
      if n <= Int.MaxValue && bytes.length - (i + 1) >= n
    } yield (w, h, i + 1)
  }

  /** Decoded-image features through the SAME batched per-partition
    * interface as [[extractFeatures]] — the codec call lives inside
    * `mapPartitions`, payloads never leave their partition, and only
    * fixed-width features return to columnar land. Undecodable
    * payloads drop (flatMap over the decoder's Option). */
  def extractImageFeatures(spark: SparkSession,
                           media: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { batch =>
      batch.flatMap { row =>
        decodePpm(row.bytes).map { case (w, h, means) =>
          ImageFeatures(row.media_id, w, h, means(0), means(1), means(2))
        }
      }
    }
  }

  /** Average-pooled grayscale grid from a P6 payload: `gw`×`gh` cells,
    * cell (r,c) averaging the box of source pixels mapping onto it
    * (x→c = x*gw/W, y→r = y*gh/H — exact for integer downscales, box
    * pooling otherwise). Gray = (R+G+B)/3. None on malformed payloads
    * or images smaller than the grid. Row-major: index r*gw + c. */
  def decodePpmGray(bytes: Array[Byte], gw: Int, gh: Int): Option[Array[Double]] = {
    parsePpmHeader(bytes).collect { case (w, h, base) if w >= gw && h >= gh =>
      val sums = new Array[Double](gw * gh)
      val counts = new Array[Int](gw * gh)
      var y = 0
      while (y < h) {
        val r = y * gh / h
        var x = 0
        while (x < w) {
          val c = x * gw / w
          val p = base + (y * w + x) * 3
          val gray = ((bytes(p) & 0xff) + (bytes(p + 1) & 0xff) +
            (bytes(p + 2) & 0xff)) / 3.0
          sums(r * gw + c) += gray
          counts(r * gw + c) += 1
          x += 1
        }
        y += 1
      }
      Array.tabulate(gw * gh)(i => sums(i) / counts(i))
    }
  }

  /** Difference hash (dHash) of a 9×8 pooled grayscale grid: bit
    * (r,c) = 1 iff cell (r,c+1) > cell (r,c) — the horizontal
    * gradient sign, invariant under any brightness shift that
    * preserves pixel ordering. Packed as TWO 32-bit halves (rows 0–3
    * and 4–7, bit index r*8+c within each) so downstream arithmetic —
    * banding, xor, bit_count — stays in non-negative BIGINT range in
    * any engine (a single 64-bit word would need bit 63). */
  final case class PerceptualHash(media_id: Long, hash_hi: Long, hash_lo: Long)

  def dHashOf(gray9x8: Array[Double]): (Long, Long) = {
    require(gray9x8.length == 72, "dHash expects a 9x8 grid")
    var hi = 0L; var lo = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (gray9x8(r * 9 + c + 1) > gray9x8(r * 9 + c)) {
          if (r < 4) hi |= 1L << (r * 8 + c)
          else lo |= 1L << ((r - 4) * 8 + c)
        }
        c += 1
      }
      r += 1
    }
    (hi, lo)
  }

  /** One resized-grid cell: media, cell coordinates, pooled gray. */
  final case class GridCell(media_id: Long, r: Int, c: Int, v: Double)

  /** Image RESIZE through the batched codec interface: decode (real
    * P6 parse) and box-average to a `gw`×`gh` grayscale grid, one row
    * per (media, cell) — the downsample/thumbnail shape of a
    * multimodal pipeline, kept distributed (payloads never leave
    * their partition; only fixed-width cells return to columnar
    * land). Undecodable or sub-grid payloads drop. */
  def resizeGrid(spark: SparkSession, media: DataFrame,
                 gw: Int, gh: Int): Dataset[GridCell] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { batch =>
      batch.flatMap { row =>
        decodePpmGray(row.bytes, gw, gh).iterator.flatMap { g =>
          for (r <- 0 until gh; c <- 0 until gw)
            yield GridCell(row.media_id, r, c, g(r * gw + c))
        }
      }
    }
  }

  /** Per-payload perceptual hash through the batched codec interface:
    * decode (REAL P6 parse), pool to 9×8, dHash. Undecodable or
    * sub-grid payloads drop. */
  def perceptualHashes(spark: SparkSession, media: DataFrame): Dataset[PerceptualHash] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { batch =>
      batch.flatMap { row =>
        decodePpmGray(row.bytes, 9, 8).map { g =>
          val (hi, lo) = dHashOf(g)
          PerceptualHash(row.media_id, hi, lo)
        }
      }
    }
  }

  /** Perceptual near-duplicate pairs by banded Hamming join — the
    * image arm of the near-dedup family, banded exactly like MinHash
    * LSH: the 64 dHash bits split into four 16-bit bands; candidate
    * pairs come from a band EQUI-join (never an all-pairs scan), and
    * by pigeonhole any pair within Hamming distance ≤ 3 shares at
    * least one untouched band, so recall at the default `maxDist = 3`
    * is exact. Bands whose bucket exceeds `maxBucketDf` distinct
    * payloads (flat/black images all hash alike) are dropped before
    * the join — the same fanout guard every candidate join in the
    * engine uses, the load-bearing bound at 100 TB. Candidates are
    * verified by true Hamming distance (xor + bit_count, codegen'd).
    * Shuffles: one band groupBy, one band join, one pair distinct. */
  def perceptualNearDup(hashes: DataFrame, maxDist: Int = 3,
                        maxBucketDf: Int = 200): DataFrame = {
    require(maxDist >= 0 && maxDist <= 6,
      "maxDist beyond 6 breaks the 4-band pigeonhole recall guarantee at 3; " +
        "recall above 3 is best-effort, above 6 unsupported")
    val banded = hashes.select(col("media_id"), col("hash_hi"), col("hash_lo"),
      posexplode(array(
        expr("hash_hi div 65536"), expr("hash_hi % 65536"),
        expr("hash_lo div 65536"), expr("hash_lo % 65536")))
        .as(Seq("band_idx", "band_val")))
    val hot = banded.groupBy("band_idx", "band_val")
      .agg(countDistinct("media_id").as("__df"))
      .where(col("__df") > maxBucketDf)
      .select("band_idx", "band_val")
    val b = banded.join(hot, Seq("band_idx", "band_val"), "left_anti")
    val a2 = b.select(col("band_idx"), col("band_val"),
      col("media_id").as("a_id"), col("hash_hi").as("a_hi"),
      col("hash_lo").as("a_lo"))
    val b2 = b.select(col("band_idx"), col("band_val"),
      col("media_id").as("b_id"), col("hash_hi").as("b_hi"),
      col("hash_lo").as("b_lo"))
    a2.join(b2, Seq("band_idx", "band_val"))
      .where(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_hi", "a_lo", "b_hi", "b_lo").distinct()
      .withColumn("dist",
        bit_count(col("a_hi").bitwiseXOR(col("b_hi"))) +
          bit_count(col("a_lo").bitwiseXOR(col("b_lo"))))
      .where(col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("dist").cast("long").as("dist"))
  }

  /** Binary PPM (P6) encoder — the test/fixture half of
    * [[decodePpm]]: `pixels` are row-major RGB triplets, one byte per
    * channel. */
  def encodePpm(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height * 3,
      s"need ${width * height * 3} bytes, got ${pixels.length}")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    header ++ pixels
  }

  /** The same features as pure builtin EXPRESSIONS — no typed
    * row-by-row hop: length on binary, byte values decoded from hex
    * pairs inside array HOFs. This is the hot-path form (the typed
    * `extractFeatures` stays as the codec-call shape a real decoder
    * needs); `MultimodalSpec` pins the two outputs equal. */
  def extractFeaturesExpr(media: DataFrame): DataFrame = {
    val n = length(col("bytes")).cast("long")
    // hex() yields 2 chars per byte; sum the first 8 byte values.
    // Guard the empty payload: sequence(1, 0) would DESCEND, not be
    // empty — the when keeps the lambda off zero-length hex strings.
    val headHex = hex(substring(col("bytes"), 1, 8))
    val headSum = when(length(headHex) > 0, aggregate(
      transform(sequence(lit(1), (length(headHex) / 2).cast("int")),
        i => conv(substring(headHex, i * 2 - 1, lit(2)), 16, 10).cast("long")),
      lit(0L), (a, b) => a + b)).otherwise(lit(0L))
    val tailByte = when(n > 0,
      conv(hex(substring(col("bytes"), -1, 1)), 16, 10).cast("long"))
      .otherwise(lit(0L))
    media.select(col("media_id"), col("format"),
      n.as("n_bytes"), headSum.as("head_sum"), tailByte.as("tail_byte"))
  }

  /** Frame sampling: cut `frameCount` fixed-width windows at an even
    * stride out of each payload — the video-frame / audio-clip
    * extraction shape. A real pipeline would seek to container
    * keyframes (the codec stub again); the Spark-side plumbing is the
    * real thing: one row per (media, frame) via posexplode, payload
    * slices through codegen'd `substring` on binary (no UDF), frames
    * stay distributed next to their source row. Frame offsets are
    * 1-based byte positions; payloads shorter than `frameLen` yield
    * their full remainder, empty slices are dropped.
    */
  def frameSample(media: DataFrame, frameCount: Int, frameLen: Int): DataFrame = {
    require(frameCount > 1 && frameLen > 0, "need >1 frames of >0 bytes")
    // integral stride on a non-negative domain (div == floor there, in
    // any engine); the last frame starts flush with the payload tail
    val stride =
      s"greatest(greatest(length(bytes) - $frameLen, 0) div ${frameCount - 1}, 1)"
    media
      .withColumn("stride", expr(stride))
      .select(col("media_id"), col("format"), col("bytes"),
        posexplode(expr(
          s"""transform(sequence(0, ${frameCount - 1}),
             |  i -> least(cast(i as bigint) * stride + 1,
             |             cast(length(bytes) as bigint)))""".stripMargin))
          .as(Seq("frame_idx", "start")))
      .select(col("media_id"), col("format"), col("frame_idx"), col("start"),
        expr(s"substring(bytes, start, $frameLen)").as("frame"))
      .where(length(col("frame")) > 0)
  }

  /** Per-payload block hashes: the payload cut into fixed `block`-byte
    * windows, each hashed (md5 over the lowercased hex of the slice —
    * engine-portable bytes-to-string, so an oracle reproduces it).
    * The binary arm of the dedup family: re-encoded or
    * metadata-appended copies of a payload keep most blocks
    * bit-identical even when the whole-payload hash differs. */
  def blockHashes(media: DataFrame, block: Int): DataFrame = {
    require(block > 0, "block size must be positive")
    media
      .withColumn("__nb",
        ceil(length(col("bytes")).cast("long") / lit(block.toDouble))
          .cast("int"))
      .where(col("__nb") > 0)
      .select(col("media_id"),
        posexplode(expr(
          s"""transform(sequence(0, __nb - 1),
             |  i -> md5(lower(hex(substring(bytes, i * $block + 1, $block)))))
             |""".stripMargin)).as(Seq("block_idx", "block_hash")))
  }

  /** Binary near-duplicate pairs by shared-block fraction: candidate
    * pairs come from a block-hash EQUI-join (never an all-pairs scan),
    * scored by |shared blocks| / |blocks of the smaller payload|.
    * Blocks occurring in more than `maxBlockDf` payloads (zero
    * padding, shared headers) are dropped before the join — the same
    * fanout guard the text decontamination join uses, a no-op on
    * distinctive content and the load-bearing bound at 100 TB.
    * Shuffles: one explode+join on block_hash, one pair groupBy. */
  def blockNearDup(media: DataFrame, block: Int, minShared: Double,
                   maxBlockDf: Int = 100): DataFrame = {
    require(minShared > 0 && minShared <= 1, "minShared in (0,1]")
    val hashes = blockHashes(media, block)
    val common = hashes.groupBy("block_hash")
      .agg(countDistinct("media_id").as("__df"))
      .where(col("__df") <= maxBlockDf).select("block_hash")
    val h = hashes.join(common, Seq("block_hash"), "left_semi")
      // count distinct blocks per payload once; pairs compare sets
      .select(col("media_id"), col("block_hash")).distinct()
    val sizes = h.groupBy("media_id").agg(count(lit(1)).as("n_blocks"))
    val a = h.select(col("media_id").as("a_id"), col("block_hash"))
    val b = h.select(col("media_id").as("b_id"), col("block_hash"))
    a.join(b, Seq("block_hash")).where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("media_id").as("a_id"),
        col("n_blocks").as("a_blocks")), Seq("a_id"))
      .join(sizes.select(col("media_id").as("b_id"),
        col("n_blocks").as("b_blocks")), Seq("b_id"))
      .withColumn("share_frac",
        col("shared") / least(col("a_blocks"), col("b_blocks")))
      .where(col("share_frac") >= minShared)
      .select("a_id", "b_id", "shared", "share_frac")
  }
}
