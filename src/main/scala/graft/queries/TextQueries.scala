package graft.queries

import org.apache.spark.sql.functions._
import graft.lake.TableStore
import graft.ops.{Dedup, TextOps}
import Queries.{Entry, t}

/** LLM-pipeline text operators over `documents` (north-star extension):
  * exact + MinHash dedup, quality scoring, language ID, token stats,
  * fingerprinting. Oracle SQL mirrors the exact same algorithm in
  * DuckDB dialect wherever the building blocks (md5, string_split,
  * list ops) exist in both engines.
  */
object TextQueries {

  /** Exact dedup by content hash — groupBy(md5), single shuffle. */
  val dedupExact: Entry = Entry(
    "dedup_exact_docs",
    (s, dir) => Dedup.exact(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("content_hash"),
    Some("""SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY content_hash""".stripMargin))

  /** Per-document quality metrics: token counts, lexical diversity. */
  val textQuality: Entry = Entry(
    "text_quality_metrics",
    (s, dir) => t(s, dir, "documents")
      .select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        TextOps.distinctTokenCount(col("text")).as("n_distinct"),
        TextOps.typeTokenRatio(col("text")).as("ttr"),
        TextOps.avgTokenLen(col("text")).as("avg_tok_len"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
        |  round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |        / len(string_split(text, ' ')), 4) AS ttr,
        |  round(CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |        / len(string_split(text, ' ')), 4) AS avg_tok_len
        |FROM documents ORDER BY doc_id""".stripMargin))

  /** Corpus stats per language label. */
  val langStats: Entry = Entry(
    "lang_corpus_stats",
    (s, dir) => t(s, dir, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        round(avg("n_chars"), 4).as("avg_chars"),
        sum(TextOps.tokenCount(col("text"))).as("total_tokens"))
      .orderBy("lang"),
    Some("""SELECT lang, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin))

  /** Global token frequency top-20 (explode → count). */
  val tokenFrequency: Entry = Entry(
    "token_frequency_top20",
    (s, dir) => t(s, dir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(20),
    Some("""SELECT token, count(*) AS freq
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY freq DESC, token LIMIT 20""".stripMargin))

  /** Heuristic language ID by stopword votes, scored against the label.
    * (Fixture text is synthetic English-ish for every lang label, so
    * the interesting output is the vote distribution, not accuracy.) */
  private val stopwordLists = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  val langIdNgram: Entry = Entry(
    "lang_id_stopword_votes",
    (s, dir) => t(s, dir, "documents")
      .select(col("lang"),
        TextOps.langId(col("text"), stopwordLists).as("pred_lang"))
      .groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "pred_lang"),
    Some {
      def hits(words: Seq[String]) =
        words.map(w => s"list_contains(toks, '$w')::INT").mkString(" + ")
      s"""WITH scored AS (
         |  SELECT lang,
         |    ${stopwordLists.map { case (l, ws) =>
               s"(${hits(ws)}) AS hits_$l" }.mkString(",\n    ")}
         |  FROM (SELECT lang, list_distinct(string_split(text, ' ')) AS toks
         |        FROM documents)),
         |pred AS (
         |  SELECT lang, CASE
         |    WHEN greatest(hits_en, hits_es, hits_de, hits_fr) = 0 THEN 'unk'
         |    WHEN hits_fr > hits_de AND hits_fr > hits_es AND hits_fr > hits_en THEN 'fr'
         |    WHEN hits_de > hits_es AND hits_de > hits_en THEN 'de'
         |    WHEN hits_es > hits_en THEN 'es'
         |    ELSE 'en' END AS pred_lang
         |  FROM scored)
         |SELECT lang, pred_lang, count(*) AS n FROM pred
         |GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin
    })

  /** Head/tail/length document fingerprint (blocking signature). */
  val docFingerprint: Entry = Entry(
    "doc_fingerprint_collisions",
    (s, dir) => t(s, dir, "documents")
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"))
      .agg(count(lit(1)).as("distinct_fps"),
        sum("n_docs").as("total_docs"),
        max("n_docs").as("max_bucket"),
        min("fp").as("first_fp"))
      ,
    Some("""WITH fp AS (
        |  SELECT doc_id, md5(
        |    array_to_string(toks[1:3], ' ') || '|' ||
        |    CAST(len(toks) AS VARCHAR) || '|' ||
        |    CAST(length(text) AS VARCHAR)) AS fp
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS toks
        |        FROM documents)),
        |buckets AS (
        |  SELECT fp, count(*) AS n_docs FROM fp GROUP BY fp)
        |SELECT count(*) AS distinct_fps, CAST(sum(n_docs) AS BIGINT) AS total_docs,
        |       max(n_docs) AS max_bucket, min(fp) AS first_fp
        |FROM buckets""".stripMargin))

  /** Oracle CTE block shared by the minhash queries: shingles → one
    * 48-bit md5-derived hash per shingle → the same seeded affine
    * permutations as Dedup.minhashSignatures → LSH band keys. `rel`
    * must expose (doc_id, text). */
  private def minhashBandsSql(rel: String): String = {
    val abRows = Dedup.minhashAB(8).zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
    s"""sh AS (
       |  SELECT doc_id, unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
       |           FOR i IN range(1, greatest(len(toks) - 1, 2))])) AS shingle
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM $rel)),
       |hv AS (
       |  SELECT doc_id, ${OracleSql.hex12ToBigint("hx")} % 2147483647 AS hh
       |  FROM (SELECT doc_id, md5(shingle) AS hx FROM sh)),
       |ab(h, a, b) AS (VALUES $abRows),
       |sig AS (
       |  SELECT doc_id, h, min((hh * a + b) % 2147483647) AS minhash
       |  FROM hv, ab GROUP BY doc_id, h),
       |bands AS (
       |  SELECT doc_id, h // 2 AS band,
       |    md5(string_agg(CAST(h AS VARCHAR) || ':' || CAST(minhash AS VARCHAR), '|'
       |        ORDER BY CAST(h AS VARCHAR) || ':' || CAST(minhash AS VARCHAR))) AS band_key
       |  FROM sig GROUP BY doc_id, h // 2)""".stripMargin
  }

  /** Hot-bucket cap shared by the minhash queries (and mirrored in
    * their oracles): buckets larger than this emit a star around the
    * bucket-min instead of all pairs — the knob that keeps
    * duplicate-heavy corpora subquadratic (a 100-copy family is
    * m−1 star edges, not m(m−1)/2 pairs, and the downstream Jaccard
    * verify shrinks with it). */
  private val StarCap = 16

  /** Oracle CTEs mirroring [[Dedup.pairsFromBands]] with the star
    * cap: `sized` measures each bucket, small buckets emit all pairs,
    * oversized ones the bucket-min star. Expects the `bands` CTE from
    * [[minhashBandsSql]] in scope. */
  private def minhashCandsSql: String =
    s"""sized AS (
       |  SELECT band, band_key, count(*) AS bn, min(doc_id) AS min_id
       |  FROM bands GROUP BY band, band_key),
       |cands AS (
       |  SELECT DISTINCT a, b FROM (
       |    SELECT l.doc_id AS a, r.doc_id AS b
       |    FROM bands l JOIN bands r
       |      ON l.band = r.band AND l.band_key = r.band_key
       |      AND l.doc_id < r.doc_id
       |    JOIN sized s ON s.band = l.band AND s.band_key = l.band_key
       |    WHERE s.bn <= $StarCap
       |    UNION ALL
       |    SELECT s.min_id AS a, x.doc_id AS b
       |    FROM bands x JOIN sized s
       |      ON s.band = x.band AND s.band_key = x.band_key
       |    WHERE s.bn > $StarCap AND x.doc_id <> s.min_id))""".stripMargin

  /** MinHash-LSH near-dup candidates + exact Jaccard verify ≥ 0.5.
    * Same integer-permutation minhash in both engines (Dedup
    * scaladoc), same hot-bucket star cap on both sides. */
  val minhashNearDup: Entry = Entry(
    "minhash_lsh_neardup",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val cands = Dedup.minhashCandidates(docs, "doc_id", "text",
        shingleN = 3, numHashes = 8, rowsPerBand = 2, starAbove = StarCap)
      Dedup.jaccard(docs, "doc_id", "text", cands)
        .where(col("jaccard") >= 0.5)
        .orderBy("a", "b")
    },
    Some(s"""WITH ${minhashBandsSql("documents")},
        |$minhashCandsSql,
        |toksets AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents)
        |SELECT a, b, round(CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE)
        |    / len(list_distinct(list_concat(ta.toks, tb.toks))), 4) AS jaccard
        |FROM cands JOIN toksets ta ON a = ta.doc_id
        |JOIN toksets tb ON b = tb.doc_id
        |WHERE round(CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE)
        |    / len(list_distinct(list_concat(ta.toks, tb.toks))), 4) >= 0.5
        |ORDER BY a, b""".stripMargin))

  /** Near-dup clusters: the verified minhash pairs promoted to
    * connected components (min-label propagation) — the step that
    * elects ONE representative per duplicate family instead of
    * dropping both ends of every pair. Oracle: the same pairs CTE
    * plus a recursive min-label closure — each node's component is
    * the smallest doc_id it can reach. */
  val nearDupComponents: Entry = Entry(
    "neardup_components",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val cands = Dedup.minhashCandidates(docs, "doc_id", "text",
        shingleN = 3, numHashes = 8, rowsPerBand = 2, starAbove = StarCap)
      val pairs = Dedup.jaccard(docs, "doc_id", "text", cands)
        .where(col("jaccard") >= 0.5).select("a", "b")
      Dedup.connectedComponents(pairs).orderBy("id")
    },
    Some(s"""WITH RECURSIVE ${minhashBandsSql("documents")},
        |$minhashCandsSql,
        |toksets AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents),
        |pairs AS (
        |  SELECT a, b FROM cands JOIN toksets ta ON a = ta.doc_id
        |  JOIN toksets tb ON b = tb.doc_id
        |  WHERE round(CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE)
        |      / len(list_distinct(list_concat(ta.toks, tb.toks))), 4) >= 0.5),
        |edges AS (
        |  SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
        |nodes AS (SELECT DISTINCT a AS id FROM edges),
        |reach(id, lbl) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.b, r.lbl FROM reach r JOIN edges e ON r.id = e.a)
        |SELECT id, min(lbl) AS component FROM reach
        |GROUP BY id ORDER BY id""".stripMargin))

  /** The dedup ACTION step: components → elect ONE canonical doc per
    * duplicate family (best quality = max n_chars, doc_id tiebreak;
    * singletons are their own family) and report per-lang survivor
    * counts — the "which rows does near-dedup actually keep" answer a
    * curation pipeline ships. The election is a per-family row_number:
    * the shuffle is keyed by family, so each reducer sorts only its
    * own families' rows (near-dup families are small by construction —
    * the hot-bucket cap bounds them upstream). */
  val nearDupCanonical: Entry = Entry(
    "neardup_canonical_keep",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents")
      val cands = Dedup.minhashCandidates(docs, "doc_id", "text",
        shingleN = 3, numHashes = 8, rowsPerBand = 2, starAbove = StarCap)
      val pairs = Dedup.jaccard(docs, "doc_id", "text", cands)
        .where(col("jaccard") >= 0.5).select("a", "b")
      val comp = Dedup.connectedComponents(pairs)
      val withFamily = docs.join(comp, docs("doc_id") === comp("id"),
          "left_outer")
        .withColumn("family", coalesce(col("component"), col("doc_id")))
      val w = Window.partitionBy("family")
        .orderBy(col("n_chars").desc, col("doc_id"))
      withFamily.withColumn("rk", row_number().over(w))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("rk") === 1, 1L).otherwise(0L)).as("n_survivors"))
        .orderBy("lang")
    },
    Some(s"""WITH RECURSIVE ${minhashBandsSql("documents")},
        |$minhashCandsSql,
        |toksets AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents),
        |pairs AS (
        |  SELECT a, b FROM cands JOIN toksets ta ON a = ta.doc_id
        |  JOIN toksets tb ON b = tb.doc_id
        |  WHERE round(CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE)
        |      / len(list_distinct(list_concat(ta.toks, tb.toks))), 4) >= 0.5),
        |edges AS (
        |  SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
        |nodes AS (SELECT DISTINCT a AS id FROM edges),
        |reach(id, lbl) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.b, r.lbl FROM reach r JOIN edges e ON r.id = e.a),
        |comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY id),
        |fam AS (
        |  SELECT d.doc_id, d.lang, d.n_chars,
        |         coalesce(c.component, d.doc_id) AS family
        |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY family
        |      ORDER BY n_chars DESC, doc_id) AS rk FROM fam)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_survivors
        |FROM rk GROUP BY lang ORDER BY lang""".stripMargin))

  /** Incremental near-dedup arrival path: the corpus's LSH bands are
    * PERSISTED as a lake table (Dedup.indexBands, computed once); a
    * new batch computes only its own bands and joins the stored index
    * (Dedup.batchCandidates) — O(batch), not O(corpus), per arrival.
    * Oracle: bands over the whole table split by the same id
    * boundary, since per-doc band computation is independent of the
    * split. */
  val incrementalNearDup: Entry = Entry(
    "incremental_neardup_batch",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val store = new TableStore(s,
        Queries.scratchDir("graft-bandidx"))
      Dedup.indexBands(store, "band_index",
        docs.where(col("doc_id") < 400), "doc_id", "text")
      val pairs = Dedup.batchCandidates(store, "band_index",
        docs.where(col("doc_id") >= 400), "doc_id", "text")
      Dedup.jaccard(docs, "doc_id", "text", pairs)
        .where(col("jaccard") >= 0.5)
        .select(col("a").as("corpus_id"), col("b").as("batch_id"),
          col("jaccard"))
        .orderBy("corpus_id", "batch_id")
    },
    Some(s"""WITH ${minhashBandsSql("documents")},
        |cands AS (
        |  SELECT DISTINCT l.doc_id AS corpus_id, r.doc_id AS batch_id
        |  FROM bands l JOIN bands r
        |    ON l.band = r.band AND l.band_key = r.band_key
        |    AND l.doc_id < 400 AND r.doc_id >= 400),
        |toksets AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents)
        |SELECT corpus_id, batch_id,
        |  round(CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE)
        |    / len(list_distinct(list_concat(ta.toks, tb.toks))), 4) AS jaccard
        |FROM cands JOIN toksets ta ON corpus_id = ta.doc_id
        |JOIN toksets tb ON batch_id = tb.doc_id
        |WHERE round(CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE)
        |    / len(list_distinct(list_concat(ta.toks, tb.toks))), 4) >= 0.5
        |ORDER BY corpus_id, batch_id""".stripMargin))

  /** Round-3 composed flagship — the full training-data EXPORT path
    * in one plan: quality gate (token count + TTR) → near-dup
    * clustering (minhash LSH pairs → connected components, keep each
    * family's representative) → exact-size per-language cap
    * (stratified hash rank) → sequence packing into 256-token
    * examples. Every stage is the already-oracle-checked operator;
    * the oracle composes them verbatim (recursive CTE for the
    * components). */
  val trainingExport: Entry = Entry(
    "training_export_e2e",
    (s, dir) => {
      // gated feeds the candidate legs, jaccard legs, the survivor
      // anti-join, and the sampler — checkpoint once (same move as
      // the curation flagship)
      val gated = t(s, dir, "documents")
        .where(TextOps.tokenCount(col("text")) >= 20 &&
          TextOps.typeTokenRatio(col("text")) >= 0.45)
        .localCheckpoint()
      // star-capped candidates (same knob as minhash_lsh_neardup):
      // the flagship was the last steep K=100 family (exponent 0.56)
      // because a duplicate-heavy corpus made its uncapped bucket
      // pair-join — and the Jaccard verify fed by it — quadratic
      val pairs = Dedup.jaccard(gated, "doc_id", "text",
          Dedup.minhashCandidates(gated, "doc_id", "text",
            starAbove = StarCap))
        .where(col("jaccard") >= 0.5).select("a", "b")
      val dupes = Dedup.connectedComponents(pairs)
        .where(col("id") =!= col("component")).select("id")
      val unique = gated.join(dupes,
        gated("doc_id") === dupes("id"), "left_anti")
      val sampled = graft.ops.Sampling.stratifiedExact(
        unique, "lang", "doc_id", n = 30, salt = "exp1")
      TextOps.packSequences(sampled, "doc_id", "text",
          budget = 256, streamCols = Seq(col("lang")))
        .groupBy("lang", "pack_id")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("pack_tokens"),
          min("doc_id").as("first_doc"))
        .orderBy("lang", "pack_id")
    },
    Some(s"""WITH RECURSIVE gated AS (
        |  SELECT doc_id, lang, text FROM documents
        |  WHERE len(string_split(text, ' ')) >= 20
        |    AND round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |        / len(string_split(text, ' ')), 4) >= 0.45),
        |${minhashBandsSql("gated")},
        |$minhashCandsSql,
        |toksets AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        |  FROM gated),
        |pairs AS (
        |  SELECT a, b FROM cands JOIN toksets ta ON a = ta.doc_id
        |  JOIN toksets tb ON b = tb.doc_id
        |  WHERE round(CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE)
        |      / len(list_distinct(list_concat(ta.toks, tb.toks))), 4) >= 0.5),
        |edges AS (
        |  SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
        |nodes AS (SELECT DISTINCT a AS id FROM edges),
        |reach(id, lbl) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.b, r.lbl FROM reach r JOIN edges e ON r.id = e.a),
        |dupes AS (
        |  SELECT id FROM reach GROUP BY id HAVING min(lbl) <> id),
        |uniq AS (
        |  SELECT * FROM gated
        |  WHERE doc_id NOT IN (SELECT id FROM dupes)),
        |sampled AS (
        |  SELECT lang, doc_id, text FROM (
        |    SELECT u.*, row_number() OVER (PARTITION BY lang ORDER BY
        |      ${OracleSql.hex12ToBigint("md5(CAST(doc_id AS VARCHAR) || ':exp1')")},
        |      doc_id) AS rn
        |    FROM uniq u) WHERE rn <= 30),
        |toked AS (
        |  SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tok
        |  FROM sampled),
        |packed AS (
        |  SELECT *, CAST(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
        |    AS BIGINT) AS start_off
        |  FROM toked)
        |SELECT lang, start_off // 256 AS pack_id, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS pack_tokens, min(doc_id) AS first_doc
        |FROM packed GROUP BY lang, pack_id
        |ORDER BY lang, pack_id""".stripMargin))

  /** Exact-size deterministic stratified sample (Sampling
    * .stratifiedExact): the 20 docs per lang with the smallest salted
    * hashes — same selection on any engine/partitioning/run, asserted
    * by the oracle picking identical rows from the replayed hash. */
  val stratifiedSample: Entry = Entry(
    "stratified_sample_exact",
    (s, dir) => graft.ops.Sampling.stratifiedExact(t(s, dir, "documents"),
        "lang", "doc_id", n = 20, salt = "strat1")
      .select("lang", "doc_id")
      .orderBy("lang", "doc_id"),
    Some(s"""WITH h AS (
        |  SELECT lang, doc_id,
        |    ${OracleSql.hex12ToBigint("md5(CAST(doc_id AS VARCHAR) || ':strat1')")} AS hh
        |  FROM documents),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY lang
        |      ORDER BY hh, doc_id) AS rn FROM h)
        |SELECT lang, doc_id FROM r WHERE rn <= 20
        |ORDER BY lang, doc_id""".stripMargin))

  /** Quality-weighted deterministic sampling
    * ([[graft.ops.Sampling.weightedSample]], Efraimidis-Spirakis
    * A-ES): 30 docs per language with inclusion odds ∝ n_chars —
    * the reproducible "prefer longer/better documents" corpus draw.
    * The oracle replays the exponential-key competition exactly
    * (same md5-derived uniform, same -ln(u)/w key). */
  val weightedSampleQ: Entry = Entry(
    "quality_weighted_sample",
    (s, dir) => graft.ops.Sampling.weightedSample(
        t(s, dir, "documents"), "lang", "doc_id",
        col("n_chars").cast("double"), n = 30, salt = "wq1")
      .select("lang", "doc_id")
      .orderBy("lang", "doc_id"),
    Some(s"""WITH h AS (
        |  SELECT lang, doc_id, n_chars,
        |    (${OracleSql.hex12ToBigint("md5(CAST(doc_id AS VARCHAR) || ':wq1')")} + 1)
        |      / 281474976710656.0 AS u
        |  FROM documents),
        |r AS (
        |  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
        |      ORDER BY -ln(u) / n_chars, doc_id) AS rn
        |  FROM h)
        |SELECT lang, doc_id FROM r WHERE rn <= 30
        |ORDER BY lang, doc_id""".stripMargin))

  @volatile private var tempMixOracle: Option[String] = None

  /** Temperature-scaled mixture sampling
    * ([[graft.ops.Sampling.temperatureSample]], mT5-style α-smoothing):
    * per-language quota ∝ count^0.5 rescaled to the total — small
    * languages upsample relative to their raw share — filled by a
    * deterministic uniform A-ES draw (hash48 rank within stratum,
    * WindowGroupLimit-pruned via the literal max-quota bound). Quota
    * integerization (floor + largest remainder) is driver-side
    * IEEE-ordering-sensitive arithmetic, so the quotas embed in the
    * oracle as VALUES literals (the dynamic-oracle pattern) and DuckDB
    * verifies the DRAW exactly; the quota math itself is spec-pinned
    * in SamplingSpec. */
  val temperatureMixture: Entry = new Entry(
    "temperature_mixture_sample",
    (s, dir) => {
      val (sampled, quotas) = graft.ops.Sampling.temperatureSample(
        t(s, dir, "documents"), "lang", "doc_id",
        alpha = 0.5, total = 100L, salt = "tm1")
      tempMixOracle = Some(s"""WITH q(lang, quota) AS (VALUES ${
          quotas.map { case (l, n) => s"('$l', $n)" }.mkString(", ")}),
        |h AS (
        |  SELECT lang, doc_id,
        |    ${OracleSql.hex12ToBigint("md5(CAST(doc_id AS VARCHAR) || ':tm1')")} AS u
        |  FROM documents),
        |r AS (
        |  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
        |      ORDER BY u, doc_id) AS rn
        |  FROM h)
        |SELECT r.lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM r JOIN q ON r.lang = q.lang AND rn <= quota
        |GROUP BY r.lang ORDER BY r.lang""".stripMargin)
      sampled.groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("doc_id").cast("long").as("id_sum"))
        .orderBy("lang")
    },
    () => tempMixOracle)

  /** Per-language heavy hitters: top-10 bigrams by document frequency
    * — the vocabulary/boilerplate scan over a corpus. One shuffle on
    * (lang, bigram) with map-side partial counts, then a per-lang
    * top-k window (WindowGroupLimit-pruned). Shingle construction is
    * shared with the minhash family, so the oracle replays it
    * verbatim. */
  val bigramTop: Entry = Entry(
    "bigram_top_per_lang",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val bg = t(s, dir, "documents")
        .select(col("lang"), explode(TextOps.shingles(col("text"), 2)).as("bigram"))
      val counts = bg.groupBy("lang", "bigram").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("lang").orderBy(col("df").desc, col("bigram"))
      counts.withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= 10)
        .orderBy("lang", "rnk")
    },
    Some("""WITH bg AS (
        |  SELECT lang, unnest(list_distinct([array_to_string(toks[i:i+1], ' ')
        |           FOR i IN range(1, greatest(len(toks), 2))])) AS bigram
        |  FROM (SELECT lang, doc_id, string_split(text, ' ') AS toks
        |        FROM documents)),
        |c AS (SELECT lang, bigram, count(*) AS df FROM bg GROUP BY lang, bigram),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang
        |        ORDER BY df DESC, bigram) AS rnk FROM c)
        |SELECT lang, bigram, df, rnk FROM r WHERE rnk <= 10
        |ORDER BY lang, rnk""".stripMargin))

  /** Gopher-style repetition quality filters: per-document fraction of
    * tokens in the most-repeated token, fraction of bigrams in the
    * most-repeated bigram, and duplicated-trigram fraction, gated on
    * fixed thresholds. Every metric is a per-row array expression
    * ([[graft.ops.TextOps.maxMultiplicity]] — sort + one aggregate
    * pass), so the whole filter is embarrassingly parallel over
    * documents: zero shuffles, zero joins, at any corpus size. The
    * token/n-gram arrays are materialized by STAGED projections so
    * each is evaluated once (a single flat select re-evaluates the
    * split per referencing expression — measured 1.8x slower; HOFs
    * don't codegen, so expression sharing matters). The oracle
    * replays the same counts via unnest + group-by. */
  val repetitionFilters: Entry = Entry(
    "repetition_gopher_filters",
    (s, dir) => {
      TextOps.repetitionMetrics(t(s, dir, "documents"), "doc_id", "text")
        .withColumn("keep",
          (col("top_token_frac") <= 0.125 && col("top_bigram_frac") <= 0.08 &&
            col("dup_trigram_frac") <= 0.02).cast("long"))
        .orderBy("doc_id")
    },
    Some("""WITH tk AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |ng AS (
        |  SELECT doc_id, toks,
        |    [array_to_string(toks[i:i+1], ' ')
        |       FOR i IN range(1, greatest(len(toks)-1, 1) + 1)] AS bis,
        |    [array_to_string(toks[i:i+2], ' ')
        |       FOR i IN range(1, greatest(len(toks)-2, 1) + 1)] AS tris
        |  FROM tk),
        |tc AS (SELECT doc_id, max(c) AS max_tok FROM (
        |    SELECT doc_id, w, count(*) AS c
        |    FROM (SELECT doc_id, unnest(toks) AS w FROM tk)
        |    GROUP BY doc_id, w) GROUP BY doc_id),
        |bc AS (SELECT doc_id, max(c) AS max_bi FROM (
        |    SELECT doc_id, b, count(*) AS c
        |    FROM (SELECT doc_id, unnest(bis) AS b FROM ng)
        |    GROUP BY doc_id, b) GROUP BY doc_id),
        |m AS (
        |  SELECT ng.doc_id, len(toks) AS n_tokens,
        |    round(max_tok * 1.0 / len(toks), 4) AS top_token_frac,
        |    round(max_bi * 1.0 / len(bis), 4) AS top_bigram_frac,
        |    round(1.0 - len(list_distinct(tris)) * 1.0 / len(tris), 4)
        |      AS dup_trigram_frac
        |  FROM ng JOIN tc ON ng.doc_id = tc.doc_id
        |          JOIN bc ON ng.doc_id = bc.doc_id)
        |SELECT doc_id, n_tokens, top_token_frac, top_bigram_frac,
        |  dup_trigram_frac,
        |  CAST(top_token_frac <= 0.125 AND top_bigram_frac <= 0.08
        |    AND dup_trigram_frac <= 0.02 AS BIGINT) AS keep
        |FROM m ORDER BY doc_id""".stripMargin))

  /** Per-document TF-IDF top terms: tf from one (doc, term) count,
    * document length and document frequency derived from that same
    * frame (no second corpus scan), corpus size as a broadcast 1-row
    * aggregate. Ranking happens on the 4dp-ROUNDED score with a term
    * tie-break so a last-ulp `ln` difference between engines can't
    * reorder; the per-doc window prunes via WindowGroupLimit. */
  val tfidfTopTerms: Entry = Entry(
    "tfidf_top_terms",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents")
      val tf = docs
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term"))
      tf.join(dl, "doc_id").join(dfq, "term").crossJoin(broadcast(n))
        .withColumn("tfidf",
          round(col("tf") / col("dl") * log(col("n_docs") / col("df")), 4))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= 3)
        .select("doc_id", "term", "tfidf", "rnk")
        .orderBy("doc_id", "rnk")
    },
    Some("""WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf
        |       FROM tok GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term,
        |    round(tf * 1.0 / dl * ln(n_docs * 1.0 / df), 4) AS tfidf
        |  FROM tf JOIN dl ON tf.doc_id = dl.doc_id
        |       JOIN df ON tf.term = df.term, n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |        ORDER BY tfidf DESC, term) AS rnk FROM scored)
        |SELECT doc_id, term, tfidf, rnk FROM r WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin))

  /** Per-document unigram-LM quality score: average log-probability of
    * the document's tokens under the corpus unigram distribution —
    * avg_ll = (Σ tf·ln cf − n·ln T) / n, so the only broadcastable
    * global is the 1-row total. Docs full of rare tokens score low;
    * boilerplate scores high. One token explode feeds both the corpus
    * counts and the per-doc aggregate. */
  val unigramLogprob: Entry = Entry(
    "unigram_logprob_quality",
    (s, dir) => {
      val tf = t(s, dir, "documents")
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val cf = tf.groupBy("term").agg(sum("tf").as("cf"))
      val tot = cf.agg(sum("cf").as("total"))
      tf.join(cf, "term").crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(sum("tf").as("n_tokens"),
          round((sum(col("tf") * log(col("cf"))) -
            sum(col("tf")) * log(first(col("total")))) / sum(col("tf")), 4)
            .as("avg_logprob"))
        .orderBy("doc_id")
    },
    Some("""WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf
        |       FROM tok GROUP BY doc_id, term),
        |cf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf
        |       FROM tf GROUP BY term),
        |tot AS (SELECT CAST(sum(cf) AS BIGINT) AS total FROM cf)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |  round((sum(tf * ln(cf)) - sum(tf) * ln(first(total))) / sum(tf), 4)
        |    AS avg_logprob
        |FROM tf JOIN cf USING (term), tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** BM25 top-k retrieval for a fixed term query (Okapi, Lucene IDF,
    * k1=1.2 b=0.75): the ranked-search pass over a curated corpus.
    * The term filter lands BEFORE any join, so only matching (doc,
    * term) rows flow; document length and corpus stats come from the
    * same tf frame (N and avgdl as a broadcast 1-row aggregate). Tie
    * ordering and the oracle both rank on the 4dp-rounded score. */
  val bm25TopK: Entry = Entry(
    "bm25_retrieval_topk",
    (s, dir) => {
      val qterms = Seq("spark", "table", "merge")
      val tf = t(s, dir, "documents")
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"),
        (sum("dl") / count(lit(1))).as("avgdl"))
      val dfq = tf.where(col("term").isin(qterms: _*))
        .groupBy("term").agg(count(lit(1)).as("df"))
      tf.where(col("term").isin(qterms: _*))
        .join(dfq, "term").join(dl, "doc_id").crossJoin(broadcast(stats))
        .withColumn("s",
          log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
            (col("tf") * 2.2) /
            (col("tf") +
              (col("dl") / col("avgdl") * 0.75 + 0.25) * 1.2))
        .groupBy("doc_id").agg(round(sum("s"), 4).as("score"))
        .orderBy(col("score").desc, col("doc_id")).limit(20)
    },
    Some("""WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf
        |       FROM tok GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
        |       FROM tf GROUP BY doc_id),
        |stats AS (SELECT count(*) AS n_docs,
        |            CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
        |dfq AS (SELECT term, count(*) AS df FROM tf
        |        WHERE term IN ('spark', 'table', 'merge') GROUP BY term),
        |sc AS (SELECT tf.doc_id,
        |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
        |      (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS s
        |  FROM tf JOIN dfq USING (term)
        |       JOIN dl ON tf.doc_id = dl.doc_id, stats)
        |SELECT doc_id, round(sum(s), 4) AS score FROM sc
        |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20""".stripMargin))

  /** PII scrub over the corpus, asserted as a no-op: the fixture text
    * carries no identifiers, so redacted length must equal raw length
    * and zero documents may change — pinning the scrubber's
    * no-false-positive property corpus-wide (the positive-match
    * behavior is spec-tested on crafted strings, which DuckDB's regex
    * dialect can't replay 1:1). */
  val piiRedactionNoop: Entry = Entry(
    "pii_redaction_noop",
    (s, dir) => {
      val red = TextOps.redactPii(col("text"))
      t(s, dir, "documents")
        .select(col("source"), col("text"), red.as("red"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("red")).cast("long")).as("red_chars"),
          sum((col("red") =!= col("text")).cast("long")).as("n_changed"))
        .orderBy("source")
    },
    Some("""SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(text)) AS BIGINT) AS red_chars,
        |  CAST(0 AS BIGINT) AS n_changed
        |FROM documents GROUP BY source ORDER BY source""".stripMargin))

  /** Sliding-window chunking (TextOps.slidingChunks): 8-token windows
    * every 4 tokens — the overlapping-chunk pass for retrieval
    * indexing. Pure per-row array expressions; the oracle replays the
    * same window arithmetic with a list comprehension. Bounded to
    * doc_id < 50 so the per-chunk text rows stay comparable. */
  val slidingChunksQ: Entry = Entry(
    "sliding_chunks_windows",
    (s, dir) => TextOps.slidingChunks(
        t(s, dir, "documents").where(col("doc_id") < 50),
        "doc_id", "text", width = 8, stride = 4)
      .orderBy("doc_id", "chunk_idx"),
    Some("""WITH q AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE doc_id < 50),
        |n AS (
        |  SELECT doc_id, toks,
        |         1 + (greatest(len(toks) - 8, 0) + 3) // 4 AS nc
        |  FROM q),
        |ch AS (
        |  SELECT doc_id, unnest([{'i': k, 'o': k * 4,
        |      't': array_to_string(toks[k*4+1 : k*4+8], ' ')}
        |    FOR k IN range(0, nc)]) AS c
        |  FROM n)
        |SELECT doc_id, c.i AS chunk_idx, c.o AS chunk_off,
        |  c.t AS chunk_text, len(string_split(c.t, ' ')) AS chunk_tokens
        |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin))

  /** Sequence packing (TextOps.packSequences): documents concatenated
    * per (lang, shard) stream in doc_id order, cut into 512-token
    * training examples; per-pack fill stats. The cumulative window is
    * partitioned by the stream key — sharding, not corpus size,
    * bounds each window. */
  val sequencePacking: Entry = Entry(
    "sequence_packing",
    (s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("shard", pmod(col("doc_id"), lit(4)).cast("long"))
      TextOps.packSequences(docs, "doc_id", "text",
          budget = 512, streamCols = Seq(col("lang"), col("shard")))
        .groupBy("lang", "shard", "pack_id")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("pack_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("lang", "shard", "pack_id")
    },
    Some("""WITH q AS (
        |  SELECT lang, doc_id % 4 AS shard, doc_id,
        |         len(string_split(text, ' ')) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT *, CAST(sum(n_tok) OVER (PARTITION BY lang, shard
        |      ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok
        |    AS BIGINT) AS start_off
        |  FROM q)
        |SELECT lang, shard, start_off // 512 AS pack_id,
        |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS pack_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY lang, shard, pack_id
        |ORDER BY lang, shard, pack_id""".stripMargin))

  /** N-gram (token-set) Jaccard near-dup on a blocked subset — the
    * exact-verify counterpart without LSH, lang-blocked to bound pairs. */
  val ngramJaccard: Entry = Entry(
    "ngram_jaccard_blocked",
    (s, dir) => {
      val docs = t(s, dir, "documents").where(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("lang"),
          array_distinct(TextOps.tokens(col("text"))).as("toks"))
      val l = docs.select(col("doc_id").as("a"), col("lang").as("lang_a"),
        col("toks").as("ta"))
      val r = docs.select(col("doc_id").as("b"), col("lang").as("lang_b"),
        col("toks").as("tb"))
      l.join(r, col("lang_a") === col("lang_b") && col("a") < col("b"))
        .select(col("a"), col("b"),
          round(size(array_intersect(col("ta"), col("tb"))).cast("double") /
            size(array_union(col("ta"), col("tb"))), 4).as("jaccard"))
        .where(col("jaccard") >= 0.6)
        .orderBy("a", "b")
    },
    Some("""WITH d AS (
        |  SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents WHERE doc_id % 10 = 0)
        |SELECT l.doc_id AS a, r.doc_id AS b,
        |  round(CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE)
        |    / len(list_distinct(list_concat(l.toks, r.toks))), 4) AS jaccard
        |FROM d l JOIN d r ON l.lang = r.lang AND l.doc_id < r.doc_id
        |WHERE round(CAST(len(list_intersect(l.toks, r.toks)) AS DOUBLE)
        |    / len(list_distinct(list_concat(l.toks, r.toks))), 4) >= 0.6
        |ORDER BY a, b""".stripMargin))

  /** SimHash signatures — oracle-exact: the 32-bit token hash is the
    * first 8 hex chars of md5, recomputed digit-by-digit in DuckDB. */
  val simhashSig: Entry = Entry(
    "simhash_signatures",
    (s, dir) => Dedup.simhash(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id"),
    Some {
      val votes = (0 until 32).map(b =>
        s"sum(CASE WHEN (th >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v_$b")
        .mkString(",\n    ")
      val bits = (0 until 32).map(b =>
        s"CASE WHEN v_$b > 0 THEN ${1L << b} ELSE 0 END")
        .mkString(" + ")
      s"""WITH toks AS (
         |  SELECT doc_id, md5(unnest(list_distinct(string_split(text, ' ')))) AS h
         |  FROM documents),
         |th AS (
         |  SELECT doc_id, CAST(list_sum(
         |    [(strpos('0123456789abcdef', h[d:d]) - 1)
         |       * ([268435456,16777216,1048576,65536,4096,256,16,1])[d]
         |     FOR d IN range(1, 9)]) AS BIGINT) AS th
         |  FROM toks),
         |votes AS (
         |  SELECT doc_id,
         |    $votes
         |  FROM th GROUP BY doc_id)
         |SELECT doc_id, CAST($bits AS BIGINT) AS simhash
         |FROM votes ORDER BY doc_id""".stripMargin
    })

  /** Token budgeting: whitespace vs BPE-ish token counts per source —
    * the sizing pass an LLM data pipeline runs over a corpus. */
  val tokenBudget: Entry = Entry(
    "token_budget_by_source",
    (s, dir) => t(s, dir, "documents")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCount(col("text"))).as("ws_tokens"),
        sum(TextOps.bpeTokenCount(col("text"))).as("bpe_tokens"),
        sum(length(col("text"))).as("n_chars"))
      .orderBy("source"),
    Some(s"""SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
        |  CAST(sum(len(regexp_extract_all(text, '${TextOps.bpePattern.replace("'", "''")}'))) AS BIGINT) AS bpe_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin))

  @volatile private var bpeBudgetOracle: Option[String] = None

  /** REAL-tokenizer budget ([[graft.ops.Bpe]]): merges train
    * driver-side from the CORPUS-WIDE (pre-token, frequency)
    * aggregate (Sennrich BPE, lexicographic tie-break, top-|V|
    * frequency cap), then the count runs as the vocab-bounded
    * pipeline — explode pre-tokens, segment each DISTINCT token
    * once, broadcast the piece map back — so the corpus never pays
    * per-row segmentation. Dynamic oracle: the derived
    * (token, pieces) vocabulary embeds as VALUES (same pattern as
    * the temperature quotas) and DuckDB re-runs the whole
    * distributed side — pre-tokenization, the join, the aggregate,
    * the zero-token group backfill — against it; the segmentation
    * algebra itself is spec-pinned in BpeSpec (reconstruction,
    * monotonicity, stream==batch, partition independence). */
  val bpeTokenBudget: Entry = new Entry(
    "bpe_token_budget_by_source",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      // ONE corpus aggregate feeds training, the oracle's VALUES map,
      // and the budget join's vocabulary — the previous shape paid a
      // distributed distinct+segment pass per consumer (train,
      // vocabPieces for the oracle, tokenBudget's own vocabPieces)
      // over the same token set
      val counts = graft.ops.Bpe.tokenCounts(docs, "text")
      val merges = graft.ops.Bpe.trainFromWordCounts(counts, numMerges = 64)
      val ranks = merges.zipWithIndex.toMap
      val vocab = counts.map { case (tk, _) =>
        tk -> graft.ops.Bpe.segment(tk, ranks).size.toLong }.sortBy(_._1)
      bpeBudgetOracle = Some(s"""WITH seg(tok, pieces) AS (VALUES ${
          vocab.map { case (tk, p) =>
            s"('${tk.replace("'", "''")}', $p)" }.mkString(", ")}),
        |toks AS (
        |  SELECT source, unnest(regexp_extract_all(text,
        |    '${TextOps.bpePattern.replace("'", "''")}')) AS tok
        |  FROM documents),
        |agg AS (
        |  SELECT source, count(*) AS pre_tokens,
        |    CAST(sum(pieces) AS BIGINT) AS bpe_pieces
        |  FROM toks JOIN seg USING (tok) GROUP BY source),
        |d AS (SELECT source, count(*) AS docs FROM documents GROUP BY source)
        |SELECT d.source, d.docs,
        |  COALESCE(agg.pre_tokens, 0) AS pre_tokens,
        |  COALESCE(agg.bpe_pieces, 0) AS bpe_pieces
        |FROM d LEFT JOIN agg USING (source) ORDER BY source""".stripMargin)
      val spark = s
      import spark.implicits._
      graft.ops.Bpe.tokenBudgetWith(docs, "text", "source",
          vocab.toSeq.toDF("tok", "pieces"))
        .select(col("source"), col("docs"), col("pre_tokens"),
          col("bpe_pieces"))
        .orderBy("source")
    },
    () => bpeBudgetOracle)

  @volatile private var bpePieceOracle: Option[String] = None

  /** Materialized piece-ID sequences — the training-data step beyond
    * counts: per document, the actual BPE piece ids in order (as a
    * CSV string for the compare; the library API
    * [[graft.ops.Bpe.docPieceIds]] returns the array<int>). Dynamic
    * oracle: the (pre-token → id CSV) segmentation map embeds as
    * VALUES and DuckDB replays pre-tokenization WITH position, the
    * map join, and the ordered re-assembly. Round-trip (ids →
    * pieces → original pre-token text) is spec-pinned in BpeSpec. */
  val bpePieceIds: Entry = new Entry(
    "bpe_piece_ids_export",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      // ONE corpus aggregate feeds everything driver-side: training
      // picks its capped head from the counts, and segmentation maps
      // over the SAME collected token set — the piece-id assignment,
      // the oracle's VALUES map, and the precomputed segmentation for
      // the assembly all derive from it with no further corpus pass
      // (the previous shape paid a separate distributed
      // distinct+segment pass on top of training's aggregate).
      val counts = graft.ops.Bpe.tokenCounts(docs, "text")
      val merges = graft.ops.Bpe.trainFromWordCounts(counts, numMerges = 64)
      val ranks = merges.zipWithIndex.toMap
      val segRows = counts.map { case (tk, _) =>
        (tk, graft.ops.Bpe.segment(tk, ranks)) }
      val pid = graft.ops.Bpe.pieceIdsFromSegments(segRows).toMap
      val tokIds = segRows
        .map { case (tk, ps) => (tk, ps.map(pid).mkString(",")) }
        .sortBy(_._1)
      bpePieceOracle = Some(s"""WITH seg(tok, ids, np) AS (VALUES ${
          tokIds.map { case (tk, ids) =>
            s"('${tk.replace("'", "''")}', '$ids', ${ids.count(_ == ',') + 1})"
          }.mkString(", ")}),
        |toks AS (
        |  SELECT doc_id,
        |    unnest(regexp_extract_all(text,
        |      '${TextOps.bpePattern.replace("'", "''")}')) AS tok,
        |    generate_subscripts(regexp_extract_all(text,
        |      '${TextOps.bpePattern.replace("'", "''")}'), 1) AS ord
        |  FROM documents),
        |asm AS (
        |  SELECT doc_id, string_agg(ids, ',' ORDER BY ord) AS ids_csv,
        |         CAST(sum(np) AS BIGINT) AS n_pieces
        |  FROM toks JOIN seg USING (tok) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(a.n_pieces, 0) AS n_pieces,
        |  COALESCE(a.ids_csv, '') AS ids_csv
        |FROM documents d LEFT JOIN asm a ON d.doc_id = a.doc_id
        |ORDER BY d.doc_id""".stripMargin)
      graft.ops.Bpe.docPieceIdsPreseg(docs, "doc_id", "text",
        segRows.map { case (tk, ps) => (tk, ps.map(pid)) })
        .select(col("doc_id"),
          size(col("piece_ids")).cast("long").as("n_pieces"),
          array_join(col("piece_ids"), ",").as("ids_csv"))
        .orderBy("doc_id")
    },
    () => bpePieceOracle)

  /** The flagship LLM-corpus curation pipeline, composed end to end:
    * exact dedup (canonical = min doc_id per content hash) → MinHash
    * near-dup removal (drop the higher id of every verified pair) →
    * quality gate (token count + type-token ratio) → per-language
    * curation report. Every stage is a shuffle-bounded operator from
    * the library; the report aggregates are all-integer so the oracle
    * compare has zero float-summation risk. */
  val curationE2e: Entry = Entry(
    "corpus_curation_e2e",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, dir, "documents").select("doc_id", "text", "lang")
      // the exact-deduped frame feeds five downstream references (both
      // candidate legs, both jaccard legs, the survivor anti-join) —
      // checkpoint it once instead of re-deriving the scan + md5
      // window per reference
      val kept = docs
        .withColumn("keep_id",
          min("doc_id").over(Window.partitionBy(md5(col("text")))))
        .where(col("doc_id") === col("keep_id"))
        .drop("keep_id")
        .localCheckpoint()
      val cands = Dedup.minhashCandidates(kept, "doc_id", "text",
        shingleN = 3, numHashes = 8, rowsPerBand = 2, starAbove = StarCap)
      val dropIds = Dedup.jaccard(kept, "doc_id", "text", cands)
        .where(col("jaccard") >= 0.5)
        .select(col("b").as("doc_id")).distinct()
      kept.join(dropIds, Seq("doc_id"), "left_anti")
        .withColumn("n_tokens", TextOps.tokenCount(col("text")))
        .withColumn("n_distinct", TextOps.distinctTokenCount(col("text")))
        .withColumn("ttr", TextOps.typeTokenRatio(col("text")))
        .where(col("n_tokens") >= 20 && col("ttr") >= 0.3)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens").cast("long")).as("total_tokens"),
          sum(col("n_distinct").cast("long")).as("total_distinct"),
          min("doc_id").as("first_doc"))
        .orderBy("lang")
    },
    Some(s"""WITH kept AS (
        |  SELECT doc_id, text, lang FROM (
        |    SELECT doc_id, text, lang,
        |      min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
        |    FROM documents) WHERE doc_id = keep_id),
        |${minhashBandsSql("kept")},
        |$minhashCandsSql,
        |toksets AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        |  FROM kept),
        |drops AS (
        |  SELECT DISTINCT b AS doc_id
        |  FROM cands JOIN toksets ta ON a = ta.doc_id
        |  JOIN toksets tb ON b = tb.doc_id
        |  WHERE round(CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE)
        |      / len(list_distinct(list_concat(ta.toks, tb.toks))), 4) >= 0.5),
        |qual AS (
        |  SELECT lang, doc_id,
        |    len(string_split(text, ' ')) AS n_tokens,
        |    len(list_distinct(string_split(text, ' '))) AS n_distinct,
        |    round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |          / len(string_split(text, ' ')), 4) AS ttr
        |  FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM drops))
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(sum(n_distinct) AS BIGINT) AS total_distinct,
        |  min(doc_id) AS first_doc
        |FROM qual WHERE n_tokens >= 20 AND ttr >= 0.3
        |GROUP BY lang ORDER BY lang""".stripMargin))

  /** Winnowing rolling-hash fingerprints (TextOps.winnowFingerprints):
    * docs sharing a k-min window hash pair up via a plain equi-join on
    * the fingerprint value. Every arithmetic step is integer mod
    * 2^31-1, and the oracle runs the IDENTICAL lead()-window formula. */
  val winnowPairs: Entry = Entry(
    "winnow_fingerprint_pairs",
    (s, dir) => {
      val fps = TextOps.winnowFingerprints(
        t(s, dir, "documents"), "doc_id", "text")
      val l = fps.select(col("doc_id").as("a"), col("fp"))
      val r = fps.select(col("doc_id").as("b"), col("fp"))
      l.join(r, Seq("fp")).where(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n_shared"))
        .orderBy("a", "b")
    },
    Some {
      val P = 2147483647L
      val B = 1000003L
      val c = (0 until 4).map(j =>
        BigInt(B).modPow(BigInt(3 - j), BigInt(P)).toLong)
      s"""WITH tk AS (
         |  SELECT doc_id, generate_subscripts(ts, 1) - 1 AS idx,
         |         unnest(ts) AS tok
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)),
         |th AS (
         |  SELECT doc_id, idx, ${OracleSql.hex12ToBigint("hx")} % $P AS h
         |  FROM (SELECT doc_id, idx, md5(tok) AS hx FROM tk)),
         |wh0 AS (
         |  SELECT doc_id,
         |    (h * ${c(0)} % $P + lead(h, 1) OVER w * ${c(1)} % $P
         |     + lead(h, 2) OVER w * ${c(2)} % $P
         |     + lead(h, 3) OVER w * ${c(3)} % $P) % $P AS wh
         |  FROM th WINDOW w AS (PARTITION BY doc_id ORDER BY idx)),
         |wh AS (SELECT DISTINCT doc_id, wh FROM wh0 WHERE wh IS NOT NULL),
         |fps AS (
         |  SELECT doc_id, wh AS fp FROM (
         |    SELECT *, row_number() OVER (PARTITION BY doc_id
         |        ORDER BY wh) AS rnk
         |    FROM wh) WHERE rnk <= 4)
         |SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS n_shared
         |FROM fps l JOIN fps r ON l.fp = r.fp AND l.doc_id < r.doc_id
         |GROUP BY a, b ORDER BY a, b""".stripMargin
    })

  /** Deterministic corpus mixing (ops/Sampling): per-source keep rates
    * applied through a salted hash gate in one scan — the SAME rows
    * are selected on any engine / partitioning / run, which is what
    * makes a training mix reproducible. Oracle replays the identical
    * hash decode and rate case. */
  val corpusMix: Entry = Entry(
    "corpus_mix_sampled",
    (s, dir) => graft.ops.Sampling.mixBySource(
        t(s, dir, "documents"), "source", "doc_id",
        rates = Map("src0" -> 0.9, "src1" -> 0.5),
        defaultRate = 0.2, salt = "mix1")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"))
      .orderBy("source"),
    Some(s"""WITH h AS (
        |  SELECT source, doc_id, ${OracleSql.hex12ToBigint("hx")} AS h
        |  FROM (SELECT source, doc_id,
        |          md5(CAST(doc_id AS VARCHAR) || ':mix1') AS hx
        |        FROM documents)),
        |sel AS (
        |  SELECT source, doc_id FROM h
        |  WHERE CAST(h AS DOUBLE) <
        |    (CASE WHEN source = 'src0' THEN 0.9
        |          WHEN source = 'src1' THEN 0.5
        |          ELSE 0.2 END) * 281474976710656.0)
        |SELECT source, count(*) AS n_docs, min(doc_id) AS first_doc
        |FROM sel GROUP BY source ORDER BY source""".stripMargin))

  /** Deterministic shuffle-and-shard export layout: every document
    * lands in one of 8 shards by salted hash (Sampling.shardAssign) —
    * reproducible on any engine/partitioning/run, which is what makes
    * a resumed 100 TB export write the same shards. Per-shard
    * counts/ranges/volume report. */
  val exportShards: Entry = Entry(
    "export_shards_hashed",
    (s, dir) => t(s, dir, "documents")
      .withColumn("shard",
        graft.ops.Sampling.shardAssign(col("doc_id"), 8, "exp1"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"), sum("n_chars").as("chars"))
      .orderBy("shard"),
    Some(s"""WITH h AS (
        |  SELECT doc_id, n_chars, ${OracleSql.hex12ToBigint("hx")} % 8 AS shard
        |  FROM (SELECT doc_id, n_chars,
        |          md5(CAST(doc_id AS VARCHAR) || ':exp1') AS hx
        |        FROM documents))
        |SELECT shard, count(*) AS n_docs, min(doc_id) AS first_doc,
        |  max(doc_id) AS last_doc, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM h GROUP BY shard ORDER BY shard""".stripMargin))

  /** Curriculum-style quality binning: decile assignment over the
    * (rounded, hence engine-identical) type-token ratio with an id
    * tiebreak, then per-bin corpus stats — the pass that orders
    * training data easy→hard. The deciles come from
    * [[graft.ops.Ranking.ntileExact]]: range-repartitioned exact
    * global rank (the distributed sort Spark's own orderBy does) plus
    * arithmetic bin assignment — bit-identical to the oracle's global
    * `ntile(10)` window without ever moving the corpus to one
    * reducer. */
  val curriculumBins: Entry = Entry(
    "curriculum_quality_bins",
    (s, dir) => {
      val scored = t(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.typeTokenRatio(col("text")).as("ttr"),
          TextOps.tokenCount(col("text")).as("n_tokens"))
      graft.ops.Ranking
        .ntileExact(scored, Seq(col("ttr"), col("doc_id")), 10, "bin")
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"),
          min("ttr").as("min_ttr"), max("ttr").as("max_ttr"),
          sum(col("n_tokens").cast("long")).as("total_tokens"))
        .orderBy("bin")
    },
    Some("""WITH q AS (
        |  SELECT doc_id,
        |    round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |          / len(string_split(text, ' ')), 4) AS ttr,
        |    len(string_split(text, ' ')) AS n_tokens
        |  FROM documents),
        |b AS (
        |  SELECT *, ntile(10) OVER (ORDER BY ttr, doc_id) AS bin FROM q)
        |SELECT bin, count(*) AS n_docs, min(ttr) AS min_ttr,
        |  max(ttr) AS max_ttr, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin))

  /** Content-defined chunk sharing (TextOps.cdcChunks): chunk hashes
    * appearing in two or more documents — boilerplate and mirrored
    * passages. Boundary hashes, running chunk ids, and span hashes all
    * replay identically in the oracle. */
  val cdcChunkShared: Entry = Entry(
    "cdc_chunk_shared",
    // divisor 6 (≈6-token chunks) fits the short synthetic docs — the
    // fixture's near-dups share spans at that granularity but not at
    // 16; real corpora would chunk coarser
    (s, dir) => TextOps.cdcChunks(t(s, dir, "documents"),
        "doc_id", "text", divisor = 6)
      .groupBy("chunk_hash")
      .agg(countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        max("n_tokens").as("chunk_tokens"))
      .where(col("n_docs") >= 2)
      .orderBy("chunk_hash"),
    Some(s"""WITH tk AS (
        |  SELECT doc_id, generate_subscripts(ts, 1) - 1 AS idx,
        |         unnest(ts) AS tok
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)),
        |b AS (
        |  SELECT doc_id, idx, tok,
        |    CASE WHEN ${OracleSql.hex12ToBigint("hx")}
        |         % 2147483647 % 6 = 0 THEN 1 ELSE 0 END AS boundary
        |  FROM (SELECT doc_id, idx, tok, md5(tok) AS hx FROM tk)),
        |c AS (
        |  SELECT doc_id, idx, tok, sum(boundary) OVER (
        |    PARTITION BY doc_id ORDER BY idx
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chunk_id
        |  FROM b),
        |ch AS (
        |  SELECT doc_id, chunk_id,
        |    md5(string_agg(tok, ' ' ORDER BY idx)) AS chunk_hash,
        |    count(*) AS n_tokens
        |  FROM c GROUP BY doc_id, chunk_id)
        |SELECT chunk_hash, count(DISTINCT doc_id) AS n_docs,
        |  count(*) AS n_occurrences,
        |  CAST(max(n_tokens) AS BIGINT) AS chunk_tokens
        |FROM ch GROUP BY chunk_hash
        |HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY chunk_hash""".stripMargin))

  /** Eval-set decontamination: split the corpus with the deterministic
    * hash gate (10% eval, salt "eval"), then find train documents
    * sharing ≥ 5 distinct 3-shingles with any eval document — the
    * leakage check every benchmark pipeline runs before training. The
    * join is a shingle equi-join, pre-filtered to shingles appearing
    * in ≤ 100 documents (boilerplate shingles would otherwise blow up
    * the join fanout — a no-op at fixture scale, the load-bearing
    * guard at 100 TB). */
  val decontamination: Entry = Entry(
    "decontamination_overlap",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      // the one hash-gate definition (Sampling) — eval in, train out
      val gate = graft.ops.Sampling.hashGate(col("doc_id"), 0.1, "eval")
      val evalDocs = docs.where(gate)
      val trainDocs = docs.where(!gate)
      def sh(df: org.apache.spark.sql.DataFrame, as: String) =
        df.select(col("doc_id").as(as),
          explode(TextOps.shingles(col("text"), 3)).as("sh"))
      val rare = sh(docs, "doc_id").groupBy("sh")
        .agg(countDistinct("doc_id").as("df")).where(col("df") <= 100)
        .select("sh")
      sh(trainDocs, "train_id").join(rare, Seq("sh"), "left_semi")
        .join(sh(evalDocs, "eval_id"), Seq("sh"))
        .groupBy("train_id", "eval_id")
        .agg(count(lit(1)).as("n_shared"))
        .where(col("n_shared") >= 5)
        .orderBy("train_id", "eval_id")
    },
    Some(s"""WITH g AS (
        |  SELECT doc_id, ${OracleSql.hex12ToBigint("hx")} AS h
        |  FROM (SELECT doc_id,
        |          md5(CAST(doc_id AS VARCHAR) || ':eval') AS hx
        |        FROM documents)),
        |ev AS (SELECT doc_id FROM g
        |       WHERE CAST(h AS DOUBLE) < 0.1 * 281474976710656.0),
        |tr AS (SELECT doc_id FROM g
        |       WHERE CAST(h AS DOUBLE) >= 0.1 * 281474976710656.0),
        |allsh AS (
        |  SELECT doc_id, unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
        |           FOR i IN range(1, greatest(len(toks) - 1, 2))])) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
        |rare AS (
        |  SELECT sh FROM allsh GROUP BY sh
        |  HAVING count(DISTINCT doc_id) <= 100),
        |es AS (SELECT doc_id AS eval_id, sh FROM allsh JOIN ev USING (doc_id)),
        |ts AS (SELECT doc_id AS train_id, sh FROM allsh JOIN tr USING (doc_id))
        |SELECT train_id, eval_id, count(*) AS n_shared
        |FROM ts
        |JOIN rare USING (sh)
        |JOIN es USING (sh)
        |GROUP BY train_id, eval_id
        |HAVING count(*) >= 5
        |ORDER BY train_id, eval_id""".stripMargin))

  /** Domain caps (Sampling.capPerStratum): at most 20 documents per
    * source, longest-first — one mirror-heavy domain can't dominate a
    * training mix. WindowGroupLimit prunes to ≤ cap rows per (source,
    * map partition) before the shuffle. */
  /** Benchmark decontamination at Bloom-filter scale
    * ([[graft.ops.Membership.bloomSemiJoin]]): the eval split's
    * 3-shingles become a broadcast Bloom filter; train shingles that
    * fail the probe leave the plan map-side (no shuffle), survivors
    * are verified by the exact semi join, and any train doc sharing
    * >= 1 shingle with the eval set is dropped. The sketch errs only
    * toward keeping suspects, so the output is bit-identical to the
    * plain overlap query the oracle runs — what the bloom buys at
    * 100 TB is that the definitely-clean ~99% never shuffles. */
  val bloomDecontaminate: Entry = Entry(
    "decontaminate_bloom_exact",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val gate = graft.ops.Sampling.hashGate(col("doc_id"), 0.1, "eval")
      val evalSh = docs.where(gate)
        .select(explode(TextOps.shingles(col("text"), 3)).as("sh"))
        .distinct()
      val trainDocs = docs.where(!gate)
      val trainSh = trainDocs.select(col("doc_id"),
        explode(TextOps.shingles(col("text"), 3)).as("sh"))
      val contaminated = graft.ops.Membership
        .bloomSemiJoin(trainSh, col("sh"), evalSh, col("sh"),
          expectedItems = 1000000L, fpp = 0.01)
        .select("doc_id").distinct()
      trainDocs.join(contaminated, Seq("doc_id"), "left_anti")
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    },
    Some(s"""WITH g AS (
        |  SELECT doc_id, ${OracleSql.hex12ToBigint("hx")} AS h
        |  FROM (SELECT doc_id,
        |          md5(CAST(doc_id AS VARCHAR) || ':eval') AS hx
        |        FROM documents)),
        |ev AS (SELECT doc_id FROM g
        |       WHERE CAST(h AS DOUBLE) < 0.1 * 281474976710656.0),
        |tr AS (SELECT doc_id FROM g
        |       WHERE CAST(h AS DOUBLE) >= 0.1 * 281474976710656.0),
        |allsh AS (
        |  SELECT doc_id, unnest(list_distinct([array_to_string(toks[i:i+2], ' ')
        |           FOR i IN range(1, greatest(len(toks) - 1, 2))])) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
        |es AS (SELECT DISTINCT sh FROM allsh JOIN ev USING (doc_id)),
        |dirty AS (
        |  SELECT DISTINCT a.doc_id FROM allsh a
        |  JOIN tr USING (doc_id) JOIN es USING (sh))
        |SELECT d.doc_id, d.source, d.n_chars
        |FROM documents d JOIN tr USING (doc_id)
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM dirty)
        |ORDER BY d.doc_id""".stripMargin))

  /** Exact heavy hitters at count-min-sketch cost
    * ([[graft.ops.Membership.heavyHitters]]): every token occurring
    * >= 100 times, with its exact count. The CMS pass ships one
    * eps-width counter array per partition (treeAggregate, no row
    * shuffle); only the candidate head pays the exact groupBy. CMS
    * never undercounts, so candidates are a guaranteed superset and
    * the result equals the oracle's plain GROUP BY ... HAVING. */
  val heavyHittersQ: Entry = Entry(
    "heavy_hitters_exact",
    (s, dir) => graft.ops.Membership.heavyHitters(
        t(s, dir, "documents")
          .select(explode(TextOps.tokens(col("text"))).as("token")),
        col("token"), minCount = 100L)
      .select(col("key").as("token"), col("cnt").as("freq"))
      .orderBy("token"),
    Some("""SELECT token, count(*) AS freq
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token HAVING count(*) >= 100 ORDER BY token""".stripMargin))

  /** Vocabulary coverage curve — tokens by descending frequency with
    * each prefix's cumulative share of the corpus, the
    * tokenizer-training planning query ("how big must the vocab be to
    * cover 95% of tokens?"). The cumulative sum is the classic
    * single-reducer trap (`sum().over(orderBy(freq))` with no
    * partition) — [[graft.ops.Ranking.rankedPrefixSum]] range-
    * partitions the (token, freq) domain instead, accumulating within
    * partitions and re-basing with driver-collected offsets; the
    * grand total falls out of the same offsets, so no extra pass. */
  val vocabCoverage: Entry = Entry(
    "vocab_coverage_curve",
    (s, dir) => {
      val counts = t(s, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("freq"))
      val (ranked, _, totTokens) = graft.ops.Ranking.rankedPrefixSum(
        counts, Seq(col("freq").desc, col("token")),
        "freq", "vocab_size", "cum_tokens")
      ranked.where(col("vocab_size") <= 200)
        .select(col("vocab_size"), col("token"), col("freq"),
          round(col("cum_tokens").cast("double") / lit(totTokens.toDouble), 6)
            .as("cum_frac"))
        .orderBy("vocab_size")
    },
    Some("""WITH c AS (
        |  SELECT token, count(*) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |  GROUP BY token),
        |tot AS (SELECT CAST(sum(freq) AS DOUBLE) AS t FROM c),
        |r AS (
        |  SELECT token, CAST(freq AS BIGINT) AS freq,
        |    row_number() OVER (ORDER BY freq DESC, token) AS vocab_size,
        |    CAST(sum(freq) OVER (ORDER BY freq DESC, token
        |      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum
        |  FROM c)
        |SELECT vocab_size, token, freq, round(cum / tot.t, 6) AS cum_frac
        |FROM r, tot WHERE vocab_size <= 200 ORDER BY vocab_size""".stripMargin))

  val sourceCaps: Entry = Entry(
    "source_quality_caps",
    (s, dir) => graft.ops.Sampling.capPerStratum(
        t(s, dir, "documents"), "source", 20,
        Seq(col("n_chars").desc, col("doc_id")))
      .select("doc_id", "source", "n_chars")
      .orderBy("source", "doc_id"),
    Some("""SELECT doc_id, source, n_chars FROM (
        |  SELECT doc_id, source, n_chars, row_number() OVER (
        |    PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents) WHERE rn <= 20
        |ORDER BY source, doc_id""".stripMargin))

  /** DSIR data selection (Sampling.dsirResample): hashed-bigram
    * importance weights of every document against an "en, substantial"
    * target slice, Gumbel-top-k selection. The oracle recomputes the
    * identical pipeline — md5-bucketed bigrams, add-one-smoothed
    * bucket log-ratios, hash-derived Gumbel noise — so the SELECTION
    * itself (not just the scores) is checked. */
  val dsirSelection: Entry = Entry(
    "dsir_selection",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val target = docs.where(col("lang") === "en" && col("n_chars") > 200)
      graft.ops.Sampling.dsirResample(docs, target, "doc_id", "text",
          buckets = 256, k = 50, salt = "dsir")
        .select(col("doc_id"), round(col("dsir_logw"), 4).as("logw"),
          round(col("dsir_score"), 4).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
    },
    Some(s"""WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |grams AS (
        |  SELECT doc_id, unnest([array_to_string(tk[i:i+1], ' ')
        |           FOR i IN range(1, greatest(len(tk), 2))]) AS g
        |  FROM toks),
        |rawg AS (
        |  SELECT doc_id, ${OracleSql.hex12ToBigint("hx")} % 256 AS b
        |  FROM (SELECT doc_id, md5(g) AS hx FROM grams)),
        |tgt AS (SELECT doc_id FROM documents
        |        WHERE lang = 'en' AND n_chars > 200),
        |tgtg AS (SELECT b FROM rawg JOIN tgt USING (doc_id)),
        |tot AS (SELECT (SELECT count(*) FROM rawg) AS r_tot,
        |               (SELECT count(*) FROM tgtg) AS t_tot),
        |rc AS (SELECT b, count(*) AS rc FROM rawg GROUP BY b),
        |tc AS (SELECT b, count(*) AS tc FROM tgtg GROUP BY b),
        |lam AS (
        |  SELECT coalesce(rc.b, tc.b) AS b,
        |    ln((coalesce(tc, 0) + 1) / (t_tot + 256.0)) -
        |    ln((coalesce(rc, 0) + 1) / (r_tot + 256.0)) AS lam
        |  FROM rc FULL OUTER JOIN tc ON rc.b = tc.b, tot),
        |w AS (
        |  SELECT doc_id, sum(lam) AS logw
        |  FROM rawg JOIN lam USING (b) GROUP BY doc_id),
        |gu AS (
        |  SELECT doc_id,
        |    (${OracleSql.hex12ToBigint("hx")} + 1) / 281474976710657.0 AS u
        |  FROM (SELECT doc_id,
        |          md5(CAST(doc_id AS VARCHAR) || ':dsir') AS hx
        |        FROM documents)),
        |sel AS (
        |  SELECT doc_id, logw, logw - ln(-ln(u)) AS score
        |  FROM w JOIN gu USING (doc_id))
        |SELECT doc_id, round(logw, 4) AS logw, round(score, 4) AS score
        |FROM sel ORDER BY score DESC, doc_id LIMIT 50""".stripMargin))

  /** C4/RefinedWeb-style SPAN-level corpus dedup: globally repeated
    * token spans are dropped from every document except their first
    * occurrence (lowest (doc_id, position)), and the surviving spans
    * reassemble in order — documents are REWRITTEN, not merely kept or
    * dropped (the whole-doc policies above). Spans are fixed 16-token
    * windows built inside the row by slice/transform (order-preserving
    * array ops — no explode+re-sort); the only shuffles are the
    * span-content groupBy for first-occurrence election and the
    * per-doc reassembly, both key-partitioned. Docs whose every span
    * is a repeat vanish from the output (full-duplicate collapse). */
  val spanDedup: Entry = Entry(
    "span_dedup_c4",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val spans = t(s, dir, "documents")
        .select(col("doc_id"), posexplode(expr(
          """transform(sequence(0, cast(ceil(size(split(text, ' ')) / 16.0)
            |  as int) - 1),
            |  i -> array_join(slice(split(text, ' '), i * 16 + 1, 16), ' '))"""
            .stripMargin)).as(Seq("idx", "chunk")))
      val w = Window.partitionBy("chunk").orderBy("doc_id", "idx")
      val kept = spans.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
      val out = kept.groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          expr("""array_join(transform(
            |  array_sort(collect_list(struct(idx, chunk))), x -> x.chunk), ' ')"""
            .stripMargin).as("new_text"))
      spans.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
        .join(out, "doc_id")
        .select("doc_id", "n_chunks", "n_kept", "new_text")
        .orderBy("doc_id")
    },
    Some("""WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
        |         generate_subscripts(string_split(text, ' '), 1) AS i
        |  FROM documents),
        |chunks AS (
        |  SELECT doc_id, CAST((i - 1) // 16 AS INT) AS idx,
        |         string_agg(term, ' ' ORDER BY i) AS chunk
        |  FROM tok GROUP BY doc_id, (i - 1) // 16),
        |kept AS (
        |  SELECT * FROM (
        |    SELECT doc_id, idx, chunk, row_number() OVER (
        |      PARTITION BY chunk ORDER BY doc_id, idx) AS rn
        |    FROM chunks) WHERE rn = 1),
        |outp AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |         string_agg(chunk, ' ' ORDER BY idx) AS new_text
        |  FROM kept GROUP BY doc_id),
        |tot AS (SELECT doc_id, count(*) AS n_chunks
        |        FROM chunks GROUP BY doc_id)
        |SELECT tot.doc_id, n_chunks, n_kept, new_text
        |FROM tot JOIN outp ON tot.doc_id = outp.doc_id
        |ORDER BY tot.doc_id""".stripMargin))

  /** Bigram-LM perplexity scoring (the CCNet-style LM quality gate, a
    * step past [[unigramLogprob]]): train add-k-smoothed bigram
    * probabilities on the corpus itself, score every document's
    * perplexity exp(-mean ln P(w2|w1)). Bigrams build inside the row
    * (slice-zip over the token array — no window, no per-doc sort);
    * model counts are two groupBys over the bigram frame; scoring is
    * two equi-joins against them plus a broadcast 1-row vocab size.
    * All-integer counts + one ln per distinct bigram make the 4-dp
    * rounded perplexity engine-exact. */
  val bigramPerplexity: Entry = Entry(
    "bigram_lm_perplexity",
    (s, dir) => {
      // token array staged into its own projection (one split per
      // row), and the bigram frame localCheckpointed: it feeds THREE
      // consumers (both model groupBys and the scoring join) — narrow
      // string rows, one explode pass instead of three
      val big = t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), expr(
          """explode(transform(sequence(1, size(tk) - 1),
            |  i -> struct(element_at(tk, i) AS w1,
            |              element_at(tk, i + 1) AS w2)))""".stripMargin).as("b"))
        .select(col("doc_id"), col("b.w1"), col("b.w2"))
        .localCheckpoint()
      val cb = big.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val c1 = big.groupBy("w1").agg(count(lit(1)).as("c1n"))
      val v = t(s, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("term"))
        .agg(countDistinct("term").as("v"))
      big.join(cb, Seq("w1", "w2")).join(c1, Seq("w1"))
        .crossJoin(broadcast(v))
        .withColumn("lp",
          log((col("c12") + 0.5) / (col("c1n") + col("v") * 0.5)))
        .groupBy("doc_id")
        .agg(round(exp(-avg("lp")), 4).as("ppl"),
          count(lit(1)).as("n_bigrams"))
        .orderBy("doc_id")
    },
    Some("""WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
        |         generate_subscripts(string_split(text, ' '), 1) AS i
        |  FROM documents),
        |big AS (
        |  SELECT doc_id, w1, w2 FROM (
        |    SELECT doc_id, term AS w1, lead(term) OVER (
        |      PARTITION BY doc_id ORDER BY i) AS w2
        |    FROM tok) WHERE w2 IS NOT NULL),
        |cb AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2),
        |c1 AS (SELECT w1, count(*) AS c1n FROM big GROUP BY w1),
        |v AS (SELECT count(DISTINCT term) AS v FROM tok),
        |sc AS (
        |  SELECT b.doc_id,
        |    ln((cb.c12 + 0.5) / (c1.c1n + 0.5 * v.v)) AS lp
        |  FROM big b
        |  JOIN cb ON b.w1 = cb.w1 AND b.w2 = cb.w2
        |  JOIN c1 ON b.w1 = c1.w1, v)
        |SELECT doc_id, round(exp(-avg(lp)), 4) AS ppl,
        |       count(*) AS n_bigrams
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  val entries: Seq[Entry] = Seq(dedupExact, textQuality, langStats, tokenBudget,
    bpeTokenBudget, bpePieceIds,
    tokenFrequency, langIdNgram, docFingerprint, minhashNearDup,
    nearDupComponents, nearDupCanonical, ngramJaccard, simhashSig,
    curationE2e, winnowPairs,
    corpusMix, curriculumBins, cdcChunkShared, decontamination,
    sequencePacking, stratifiedSample, weightedSampleQ, bigramTop,
    slidingChunksQ,
    incrementalNearDup, trainingExport, repetitionFilters, tfidfTopTerms,
    unigramLogprob, piiRedactionNoop, bm25TopK, exportShards,
    dsirSelection, sourceCaps, spanDedup, bigramPerplexity,
    bloomDecontaminate, heavyHittersQ, vocabCoverage, temperatureMixture)
}
