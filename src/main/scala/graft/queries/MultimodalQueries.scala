package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import Queries.{Entry, t}

/** Multimodal-column queries: binary payload + metadata plumbing with
  * per-partition feature extraction. The payload here is UTF-8 text
  * bytes (see Multimodal.deriveMediaTable), so the oracle can recompute
  * the same features from the string side (docs are ASCII). */
object MultimodalQueries {

  /** Per-document features through the binary path, checked exactly —
    * the expression form (codegen-level, no typed row hop; the typed
    * codec-shape path is spec-pinned equal in MultimodalSpec). */
  val mediaFeatures: Entry = Entry(
    "multimodal_media_features",
    (s, dir) => Multimodal.extractFeaturesExpr(
        Multimodal.deriveMediaTable(t(s, dir, "documents")))
      .orderBy("media_id"),
    Some("""SELECT doc_id AS media_id,
        |  'fmt' || CAST(doc_id % 3 AS VARCHAR) AS format,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  CAST(list_sum([ascii(substring(text, i, 1))
        |    FOR i IN range(1, least(length(text), 8) + 1)]) AS BIGINT) AS head_sum,
        |  CAST(ascii(substring(text, length(text), 1)) AS BIGINT) AS tail_byte
        |FROM documents ORDER BY media_id""".stripMargin))

  /** Per-format aggregate over extracted features. */
  val mediaFormatStats: Entry = Entry(
    "multimodal_format_stats",
    (s, dir) => Multimodal.extractFeaturesExpr(
        Multimodal.deriveMediaTable(t(s, dir, "documents")))
      .groupBy("format")
      .agg(count(lit(1)).as("n"), sum("n_bytes").as("total_bytes"),
        round(avg("head_sum"), 4).as("avg_head_sum"))
      .orderBy("format"),
    Some("""SELECT 'fmt' || CAST(doc_id % 3 AS VARCHAR) AS format,
        |  count(*) AS n, CAST(sum(length(text)) AS BIGINT) AS total_bytes,
        |  round(avg(list_sum([ascii(substring(text, i, 1))
        |    FOR i IN range(1, least(length(text), 8) + 1)])), 4) AS avg_head_sum
        |FROM documents GROUP BY format ORDER BY format""".stripMargin))

  /** Frame sampling through the binary path: 3 fixed-width windows at
    * an even stride per payload (the video-frame extraction shape, with
    * the codec seek stubbed by byte offsets). Frames are checked by
    * md5 — Spark hashes the binary slice, the oracle the identical
    * substring of the (ASCII) source text. */
  val frameSample: Entry = Entry(
    "multimodal_frame_sample",
    (s, dir) => Multimodal.frameSample(
        Multimodal.deriveMediaTable(t(s, dir, "documents")),
        frameCount = 3, frameLen = 16)
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("start"), length(col("frame")).cast("long").as("frame_len"),
        md5(col("frame")).as("frame_md5"))
      .orderBy("media_id", "frame_idx"),
    Some("""WITH s AS (
        |  SELECT doc_id AS media_id, text,
        |    CAST(length(text) AS BIGINT) AS n,
        |    greatest(greatest(length(text) - 16, 0) // 2, 1) AS stride
        |  FROM documents),
        |f AS (
        |  SELECT media_id, i AS frame_idx,
        |    least(i * stride + 1, n) AS start,
        |    substring(text, least(i * stride + 1, n), 16) AS frame
        |  FROM s, (SELECT unnest(range(3)) AS i))
        |SELECT media_id, frame_idx, start,
        |  length(frame) AS frame_len, md5(frame) AS frame_md5
        |FROM f WHERE length(frame) > 0
        |ORDER BY media_id, frame_idx""".stripMargin))

  /** Binary near-dup by shared 32-byte block hashes — the multimodal
    * arm of the dedup family (re-encoded / metadata-appended payload
    * copies keep most blocks bit-identical). Candidates from a block
    * equi-join with the common-block fanout guard; exact-duplicate
    * payloads guarantee pairs exist in the fixture. The oracle
    * recomputes the identical block hashing from the (ASCII) text. */
  val blockNearDup: Entry = Entry(
    "multimodal_block_neardup",
    (s, dir) => Multimodal.blockNearDup(
        Multimodal.deriveMediaTable(t(s, dir, "documents")),
        block = 32, minShared = 0.5)
      .select(col("a_id"), col("b_id"), col("shared"),
        round(col("share_frac"), 4).as("share_frac"))
      .orderBy("a_id", "b_id"),
    Some("""WITH blocks AS (
        |  SELECT doc_id AS media_id,
        |    unnest([md5(lower(hex(encode(substring(text, i * 32 + 1, 32)))))
        |      FOR i IN range(0, CAST(ceil(length(text) / 32.0) AS INT))])
        |      AS block_hash
        |  FROM documents WHERE length(text) > 0),
        |common AS (
        |  SELECT block_hash FROM blocks GROUP BY block_hash
        |  HAVING count(DISTINCT media_id) <= 100),
        |h AS (SELECT DISTINCT media_id, block_hash
        |      FROM blocks JOIN common USING (block_hash)),
        |sizes AS (SELECT media_id, count(*) AS n_blocks FROM h GROUP BY media_id),
        |pairs AS (
        |  SELECT a.media_id AS a_id, b.media_id AS b_id, count(*) AS shared
        |  FROM h a JOIN h b USING (block_hash)
        |  WHERE a.media_id < b.media_id
        |  GROUP BY a.media_id, b.media_id)
        |SELECT a_id, b_id, shared,
        |  round(shared * 1.0 / least(sa.n_blocks, sb.n_blocks), 4) AS share_frac
        |FROM pairs
        |JOIN sizes sa ON a_id = sa.media_id
        |JOIN sizes sb ON b_id = sb.media_id
        |WHERE shared * 1.0 / least(sa.n_blocks, sb.n_blocks) >= 0.5
        |ORDER BY a_id, b_id""".stripMargin))

  /** Perceptual image near-dup (dHash, banded like MinHash): the
    * engine side renders deterministic 18×16 P6 images (gray(x,y) =
    * (seed*31 + x*7 + y*13) % 200, +20 brightness on the copy set),
    * runs the REAL codec round trip — encodePpm → decodePpmGray 9×8
    * pool → dHash → 4×16-bit band join → Hamming verify — while the
    * oracle recomputes the identical hash arithmetic from the closed
    * form, never touching bytes. Matching output proves the whole
    * decode/pool/hash/band pipeline, and brightness-shifted copies
    * land at distance 0 by construction (gradient signs are
    * shift-invariant). */
  val phashNearDup: Entry = Entry(
    "multimodal_phash_neardup",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val base = docs.where(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("media_id"), col("doc_id").as("seed"),
          lit(0).as("shift"))
      val copies = docs.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000000L).as("media_id"),
          col("doc_id").as("seed"), lit(20).as("shift"))
      val media = base.unionByName(copies)
        .as[(Long, Long, Int)].mapPartitions { it =>
          it.map { case (id, seed, shift) =>
            val px = new Array[Byte](18 * 16 * 3)
            var y = 0
            while (y < 16) {
              var x = 0
              while (x < 18) {
                val g = ((seed * 31 + x * 7 + y * 13) % 200 + shift).toInt
                val o = (y * 18 + x) * 3
                px(o) = g.toByte; px(o + 1) = g.toByte; px(o + 2) = g.toByte
                x += 1
              }
              y += 1
            }
            (id, "ppm", Multimodal.encodePpm(18, 16, px))
          }
        }.toDF("media_id", "format", "bytes")
      val hashes = Multimodal.perceptualHashes(s, media).toDF()
      Multimodal.perceptualNearDup(hashes, maxDist = 3)
        .orderBy("a_id", "b_id")
    },
    Some("""WITH media AS (
        |  SELECT doc_id AS media_id, doc_id AS seed, 0 AS shift
        |  FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 100000000, doc_id, 20
        |  FROM documents WHERE doc_id % 10 = 0),
        |cells AS (
        |  SELECT media_id, r, c,
        |    ((seed*31 + (2*c)*7   + (2*r)*13) % 200
        |   + (seed*31 + (2*c+1)*7 + (2*r)*13) % 200
        |   + (seed*31 + (2*c)*7   + (2*r+1)*13) % 200
        |   + (seed*31 + (2*c+1)*7 + (2*r+1)*13) % 200) / 4.0 + shift AS v
        |  FROM media,
        |    (SELECT unnest(range(8)) AS r), (SELECT unnest(range(9)) AS c)),
        |bits AS (
        |  SELECT a.media_id, a.r, a.c,
        |    CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
        |  FROM cells a JOIN cells b
        |    ON a.media_id = b.media_id AND a.r = b.r AND b.c = a.c + 1
        |  WHERE a.c < 8),
        |hashes AS (
        |  SELECT media_id,
        |    CAST(sum(CASE WHEN r < 4
        |      THEN bit * (1::BIGINT << (r*8 + c)) ELSE 0 END) AS BIGINT) AS hash_hi,
        |    CAST(sum(CASE WHEN r >= 4
        |      THEN bit * (1::BIGINT << ((r-4)*8 + c)) ELSE 0 END) AS BIGINT) AS hash_lo
        |  FROM bits GROUP BY media_id),
        |bands AS (
        |  SELECT media_id, hash_hi, hash_lo, band_idx,
        |    CASE band_idx WHEN 0 THEN hash_hi // 65536 WHEN 1 THEN hash_hi % 65536
        |                  WHEN 2 THEN hash_lo // 65536 ELSE hash_lo % 65536
        |    END AS band_val
        |  FROM hashes, (SELECT unnest(range(4)) AS band_idx)),
        |ok AS (
        |  SELECT band_idx, band_val FROM bands GROUP BY 1, 2
        |  HAVING count(DISTINCT media_id) <= 200),
        |bb AS (SELECT b.* FROM bands b JOIN ok USING (band_idx, band_val)),
        |pairs AS (
        |  SELECT DISTINCT a.media_id AS a_id, b.media_id AS b_id,
        |    a.hash_hi AS a_hi, a.hash_lo AS a_lo,
        |    b.hash_hi AS b_hi, b.hash_lo AS b_lo
        |  FROM bb a JOIN bb b
        |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
        |  WHERE a.media_id < b.media_id)
        |SELECT a_id, b_id,
        |  CAST(bit_count(xor(a_hi, b_hi)) + bit_count(xor(a_lo, b_lo)) AS BIGINT) AS dist
        |FROM pairs
        |WHERE bit_count(xor(a_hi, b_hi)) + bit_count(xor(a_lo, b_lo)) <= 3
        |ORDER BY a_id, b_id""".stripMargin))

  /** Image resize through the real codec: deterministic 18×16 P6
    * payloads box-averaged to a 6×4 grid (exact 3×4-pixel boxes), one
    * row per cell. The oracle recomputes each cell's mean from the
    * closed-form pixel function — matching values prove the decode +
    * box-pooling arithmetic end to end. */
  val resizeGrid: Entry = Entry(
    "multimodal_resize_grid",
    (s, dir) => {
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id"))
        .where(col("doc_id") % 7 === 0)
        .as[Long].mapPartitions { it =>
          it.map { seed =>
            val px = new Array[Byte](18 * 16 * 3)
            var y = 0
            while (y < 16) {
              var x = 0
              while (x < 18) {
                val g = ((seed * 31 + x * 7 + y * 13) % 200).toInt
                val o = (y * 18 + x) * 3
                px(o) = g.toByte; px(o + 1) = g.toByte; px(o + 2) = g.toByte
                x += 1
              }
              y += 1
            }
            (seed, "ppm", Multimodal.encodePpm(18, 16, px))
          }
        }.toDF("media_id", "format", "bytes")
      Multimodal.resizeGrid(s, media, gw = 6, gh = 4).toDF()
        .select(col("media_id"), col("r").cast("long").as("r"),
          col("c").cast("long").as("c"), round(col("v"), 4).as("v"))
        .orderBy("media_id", "r", "c")
    },
    Some("""SELECT doc_id AS media_id, r, c,
        |  round(avg((doc_id*31 + (c*3 + dx)*7 + (r*4 + dy)*13) % 200), 4) AS v
        |FROM documents,
        |  (SELECT unnest(range(4)) AS r), (SELECT unnest(range(6)) AS c),
        |  (SELECT unnest(range(3)) AS dx), (SELECT unnest(range(4)) AS dy)
        |WHERE doc_id % 7 = 0
        |GROUP BY media_id, r, c
        |ORDER BY media_id, r, c""".stripMargin))

  val entries: Seq[Entry] = Seq(mediaFeatures, mediaFormatStats, frameSample,
    blockNearDup, phashNearDup, resizeGrid)
}
