package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{Linkage, Similarity, TextOps}
import Queries.{Entry, t}

/** Retrieval and record-linkage shapes: hybrid lexical+dense fusion
  * (the RAG / eval-retrieval workhorse) and blocked fuzzy entity
  * matching. Both are multi-key from the ground up — every window
  * partitions by query id / blocking key, so the plans scale in the
  * number of queries AND the corpus, never through a single reducer.
  */
object RetrievalQueries {

  /** Hybrid retrieval via reciprocal-rank fusion (RRF, Cormack et al.):
    * BM25 lexical top-20 and dense cosine top-20 per query, fused as
    * sum of 1/(60+rank) over the lists each doc appears in. Two
    * queries run at once — ranks partition by `qid`, so the shape is
    * the scalable batch-retrieval plan (corpus scans are shared across
    * queries; per-query state is one top-k list). Absent ranks are
    * sentinel 0, keeping the rank columns non-nullable across the full
    * outer join (nullable ints round-trip as floats in parquet/pandas,
    * which would poison the oracle hash).
    *
    * The dense side reuses [[Similarity.bruteForceTopK]] (probes
    * broadcast, corpus never shuffles); the lexical side derives
    * everything from ONE (doc, term) count frame as the BM25 query
    * does, with per-query term sets joined in from a literal frame.
    */
  val hybridRrf: Entry = Entry(
    "hybrid_retrieval_rrf",
    (s, dir) => {
      import s.implicits._
      val qterms = Seq(
        (1L, "spark"), (1L, "table"), (1L, "merge"),
        (2L, "window"), (2L, "sort"), (2L, "stream")).toDF("qid", "term")

      val tf = t(s, dir, "documents")
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"),
        (sum("dl") / count(lit(1))).as("avgdl"))
      val qtf = tf.join(broadcast(qterms), "term")
      val dfq = qtf.groupBy("qid", "term").agg(count(lit(1)).as("df"))
      val lexScore = qtf
        .join(dfq, Seq("qid", "term")).join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("s",
          log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
            (col("tf") * 2.2) /
            (col("tf") + (col("dl") / col("avgdl") * 0.75 + 0.25) * 1.2))
        .groupBy("qid", "doc_id").agg(round(sum("s"), 4).as("lex_score"))
      val wl = Window.partitionBy("qid")
        .orderBy(col("lex_score").desc, col("doc_id"))
      val lex = lexScore.withColumn("lrnk", row_number().over(wl))
        .where(col("lrnk") <= 20).select("qid", "doc_id", "lrnk")

      val emb = t(s, dir, "embeddings")
      val den = Similarity
        .bruteForceTopK(emb, emb.where(col("vec_id").isin(1, 2)), k = 20)
        .select(col("qid"), col("vid").as("doc_id"), col("rnk").as("drnk"))

      val fused = lex.join(den, Seq("qid", "doc_id"), "full_outer")
        .withColumn("lex_rnk", coalesce(col("lrnk"), lit(0)))
        .withColumn("dense_rnk", coalesce(col("drnk"), lit(0)))
        .withColumn("rrf", round(
          when(col("lex_rnk") > 0, lit(1.0) / (col("lex_rnk") + 60))
            .otherwise(0.0) +
          when(col("dense_rnk") > 0, lit(1.0) / (col("dense_rnk") + 60))
            .otherwise(0.0), 6))
      val wf = Window.partitionBy("qid")
        .orderBy(col("rrf").desc, col("doc_id"))
      fused.withColumn("fused_rnk", row_number().over(wf))
        .where(col("fused_rnk") <= 10)
        .select("qid", "doc_id", "lex_rnk", "dense_rnk", "rrf", "fused_rnk")
        .orderBy("qid", "fused_rnk")
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
        |qt(qid, term) AS (VALUES
        |  (1, 'spark'), (1, 'table'), (1, 'merge'),
        |  (2, 'window'), (2, 'sort'), (2, 'stream')),
        |dfq AS (SELECT qid, term, count(*) AS df
        |        FROM tf JOIN qt USING (term) GROUP BY qid, term),
        |sc AS (SELECT qt.qid, tf.doc_id,
        |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
        |      (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS s
        |  FROM tf JOIN qt USING (term)
        |       JOIN dfq ON qt.qid = dfq.qid AND qt.term = dfq.term
        |       JOIN dl ON tf.doc_id = dl.doc_id, stats),
        |lexs AS (SELECT qid, doc_id, round(sum(s), 4) AS lex_score
        |         FROM sc GROUP BY qid, doc_id),
        |lex AS (SELECT qid, doc_id, row_number() OVER (
        |    PARTITION BY qid ORDER BY lex_score DESC, doc_id) AS lrnk
        |  FROM lexs),
        |exp AS (
        |  SELECT vec_id, unnest(embedding) AS x,
        |         generate_subscripts(embedding, 1) AS i
        |  FROM embeddings),
        |norms AS (
        |  SELECT vec_id, sqrt(sum(CAST(x AS DOUBLE) * x)) AS nrm
        |  FROM exp GROUP BY vec_id),
        |dots AS (
        |  SELECT p.vec_id AS qid, c.vec_id AS vid,
        |         sum(CAST(p.x AS DOUBLE) * c.x) AS dp
        |  FROM exp p JOIN exp c ON p.i = c.i
        |  WHERE p.vec_id IN (1, 2) AND p.vec_id <> c.vec_id
        |  GROUP BY p.vec_id, c.vec_id),
        |den AS (SELECT qid, vid, row_number() OVER (PARTITION BY qid
        |    ORDER BY round(dp / (nq.nrm * nc.nrm), 4) DESC, vid) AS drnk
        |  FROM dots JOIN norms nq ON qid = nq.vec_id
        |       JOIN norms nc ON vid = nc.vec_id),
        |fused AS (
        |  SELECT COALESCE(l.qid, d.qid) AS qid,
        |         COALESCE(l.doc_id, d.vid) AS doc_id,
        |         COALESCE(l.lrnk, 0) AS lex_rnk,
        |         COALESCE(d.drnk, 0) AS dense_rnk
        |  FROM (SELECT * FROM lex WHERE lrnk <= 20) l
        |  FULL OUTER JOIN (SELECT * FROM den WHERE drnk <= 20) d
        |    ON l.qid = d.qid AND l.doc_id = d.vid),
        |scored AS (
        |  SELECT qid, doc_id, lex_rnk, dense_rnk,
        |    round(CASE WHEN lex_rnk > 0
        |            THEN CAST(1.0 AS DOUBLE) / (lex_rnk + 60)
        |            ELSE CAST(0.0 AS DOUBLE) END +
        |          CASE WHEN dense_rnk > 0
        |            THEN CAST(1.0 AS DOUBLE) / (dense_rnk + 60)
        |            ELSE CAST(0.0 AS DOUBLE) END, 6) AS rrf
        |  FROM fused),
        |ranked AS (SELECT *, row_number() OVER (
        |    PARTITION BY qid ORDER BY rrf DESC, doc_id) AS fused_rnk
        |  FROM scored)
        |SELECT qid, doc_id, lex_rnk, dense_rnk, rrf, fused_rnk
        |FROM ranked WHERE fused_rnk <= 10
        |ORDER BY qid, fused_rnk""".stripMargin))

  /** Blocked fuzzy record linkage over part names: distinct-name
    * aggregate → equi-join on the blocking key (the noun token) →
    * levenshtein ≤ 3 verify inside blocks only. The 100 TB shape:
    * distance runs on the distinct-name frame (names << rows), and the
    * only join is the block equi-join — no string-distance theta join
    * anywhere. */
  val fuzzyLinkage: Entry = Entry(
    "fuzzy_join_blocked",
    (s, dir) => Linkage
      .blockedFuzzyPairs(t(s, dir, "part"), "p_name",
        name => split(name, " ").getItem(1), maxDist = 3)
      .orderBy("name_a", "name_b"),
    Some("""WITH names AS (
        |  SELECT p_name AS name, count(*) AS support,
        |         string_split(p_name, ' ')[2] AS blk
        |  FROM part GROUP BY p_name),
        |pairs AS (
        |  SELECT a.name AS name_a, b.name AS name_b,
        |         levenshtein(a.name, b.name) AS dist,
        |         a.support AS n_a, b.support AS n_b
        |  FROM names a JOIN names b
        |    ON a.blk = b.blk AND a.name < b.name)
        |SELECT name_a, name_b, dist, n_a, n_b
        |FROM pairs WHERE dist <= 3
        |ORDER BY name_a, name_b""".stripMargin))

  val entries: Seq[Entry] = Seq(hybridRrf, fuzzyLinkage)
}
