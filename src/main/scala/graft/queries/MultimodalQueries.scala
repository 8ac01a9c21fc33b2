package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import Queries.{Entry, t}

/** Multimodal-column queries: binary payload + metadata plumbing with
  * per-partition feature extraction. The payload here is UTF-8 text
  * bytes (see Multimodal.deriveMediaTable), so the oracle can recompute
  * the same features from the string side (docs are ASCII). */
object MultimodalQueries {

  /** Per-document features through the binary path, checked exactly. */
  val mediaFeatures: Entry = Entry(
    "multimodal_media_features",
    (s, dir) => Multimodal.extractFeatures(s,
        Multimodal.deriveMediaTable(t(s, dir, "documents")))
      .toDF()
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
    (s, dir) => Multimodal.extractFeatures(s,
        Multimodal.deriveMediaTable(t(s, dir, "documents")))
      .toDF()
      .groupBy("format")
      .agg(count(lit(1)).as("n"), sum("n_bytes").as("total_bytes"),
        round(avg("head_sum"), 4).as("avg_head_sum"))
      .orderBy("format"),
    Some("""SELECT 'fmt' || CAST(doc_id % 3 AS VARCHAR) AS format,
        |  count(*) AS n, CAST(sum(length(text)) AS BIGINT) AS total_bytes,
        |  round(avg(list_sum([ascii(substring(text, i, 1))
        |    FOR i IN range(1, least(length(text), 8) + 1)])), 4) AS avg_head_sum
        |FROM documents GROUP BY format ORDER BY format""".stripMargin))

  val entries: Seq[Entry] = Seq(mediaFeatures, mediaFormatStats)
}
