package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Similarity
import Queries.{Entry, t}

/** Similarity search over `embeddings` (Array[Float], dim 64) —
  * north-star extension. Dot products accumulate left-to-right in
  * double on the Spark side; the oracle unnests with ordinality and
  * sums in double — both rounded to 4 dp before any ranking so the
  * compare is stable.
  */
object VectorQueries {

  /** Brute-force cosine top-5 for probe vectors (vec_id < 5). The
    * correctness baseline for ANN. */
  val cosineTopK: Entry = Entry(
    "cosine_topk_bruteforce",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 5), k = 5)
        .select("qid", "rnk", "vid", "cos")
        .orderBy("qid", "rnk")
    },
    Some("""WITH exp AS (
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
        |  WHERE p.vec_id < 5 AND p.vec_id <> c.vec_id
        |  GROUP BY p.vec_id, c.vec_id),
        |scored AS (
        |  SELECT qid, vid,
        |    round(dp / (nq.nrm * nc.nrm), 4) AS cos
        |  FROM dots JOIN norms nq ON qid = nq.vec_id
        |  JOIN norms nc ON vid = nc.vec_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY qid
        |      ORDER BY cos DESC, vid) AS rnk
        |  FROM scored)
        |SELECT qid, rnk, vid, cos FROM ranked WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin))

  /** Embedding near-dup pairs above cosine 0.25 on an id-sampled subset
    * (pairwise verify stage; LSH is the candidate-generation path). */
  val embeddingNearDup: Entry = Entry(
    "embedding_neardup_pairs",
    (s, dir) => Similarity.nearDupPairs(
        t(s, dir, "embeddings").where(col("vec_id") % 10 === 0),
        threshold = 0.25)
      .orderBy("a", "b"),
    Some("""WITH sub AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0),
        |exp AS (
        |  SELECT vec_id, unnest(embedding) AS x,
        |         generate_subscripts(embedding, 1) AS i
        |  FROM sub),
        |norms AS (
        |  SELECT vec_id, sqrt(sum(CAST(x AS DOUBLE) * x)) AS nrm
        |  FROM exp GROUP BY vec_id),
        |dots AS (
        |  SELECT a.vec_id AS a, b.vec_id AS b,
        |         sum(CAST(a.x AS DOUBLE) * b.x) AS dp
        |  FROM exp a JOIN exp b ON a.i = b.i AND a.vec_id < b.vec_id
        |  GROUP BY a.vec_id, b.vec_id)
        |SELECT a, b, round(dp / (na.nrm * nb.nrm), 4) AS cos
        |FROM dots JOIN norms na ON a = na.vec_id
        |JOIN norms nb ON b = nb.vec_id
        |WHERE round(dp / (na.nrm * nb.nrm), 4) > 0.25
        |ORDER BY a, b""".stripMargin))

  /** Per-label centroid then distance-to-centroid stats — the k-means /
    * IVF building block (vector aggregate + HOF arithmetic). */
  val labelCentroids: Entry = Entry(
    "label_centroid_distance",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      // mean vector per label: explode with ordinality, avg per dim
      val exp = emb.select(col("label"), col("vec_id"),
        posexplode(col("embedding")).as(Seq("i", "x")))
      val cent = exp.groupBy("label", "i")
        .agg(avg(col("x").cast("double")).as("cx"))
      val dist = exp.join(cent, Seq("label", "i"))
        .groupBy("label", "vec_id")
        .agg(sqrt(sum((col("x").cast("double") - col("cx")) *
          (col("x").cast("double") - col("cx")))).as("d"))
      dist.groupBy("label")
        .agg(count(lit(1)).as("n"),
          round(avg("d"), 4).as("avg_dist"),
          round(max("d"), 4).as("max_dist"))
        .orderBy("label")
    },
    Some("""WITH exp AS (
        |  SELECT label, vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |         generate_subscripts(embedding, 1) AS i
        |  FROM embeddings),
        |cent AS (
        |  SELECT label, i, avg(x) AS cx FROM exp GROUP BY label, i),
        |dist AS (
        |  SELECT e.label, e.vec_id, sqrt(sum((e.x - c.cx) * (e.x - c.cx))) AS d
        |  FROM exp e JOIN cent c ON e.label = c.label AND e.i = c.i
        |  GROUP BY e.label, e.vec_id)
        |SELECT label, count(*) AS n, round(avg(d), 4) AS avg_dist,
        |       round(max(d), 4) AS max_dist
        |FROM dist GROUP BY label ORDER BY label""".stripMargin))

  /** ANN via random-hyperplane LSH (engine-specific hash → rows-only
    * check); recall measured against brute force in the test suite. */
  val annLsh: Entry = Entry(
    "ann_lsh_topk",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.annTopK(emb, emb.where(col("vec_id") < 5), k = 5,
          numPlanes = 4)
        .select("qid", "rnk", "vid", "cos")
        .orderBy("qid", "rnk")
    },
    None)

  /** IVF-style ANN (inverted lists by nearest centroid; rows-only
    * check, recall tested in OpsSpec against brute force). */
  val ivfTopK: Entry = Entry(
    "ivf_ann_topk",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.where(col("vec_id") < 5), k = 5,
          nlist = 16, nprobe = 4)
        .select("qid", "rnk", "vid", "cos")
        .orderBy("qid", "rnk")
    },
    None)

  val entries: Seq[Entry] = Seq(cosineTopK, embeddingNearDup,
    labelCentroids, annLsh, ivfTopK)
}
