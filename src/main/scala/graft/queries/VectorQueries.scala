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

  /** Embedding near-dup pairs above cosine 0.25 over the FULL corpus:
    * multi-table LSH candidate generation (bucket equi-join — no
    * all-pairs theta join anywhere in the plan) + exact pairwise
    * verify. The hyperplanes are driver-side seeded literals
    * (Similarity.lshPlanes), so the oracle embeds the identical
    * constants and reproduces the bucketing exactly. */
  private val ndPlanes = 3
  private val ndTables = 4

  /** `(tbl, p, i, w)` VALUES rows for every plane weight of the
    * multi-table LSH (seeds 42+tbl, same as lshBucketsMulti); `i` is
    * 1-based to match generate_subscripts. */
  private def planeValuesSql(numPlanes: Int, numTables: Int): String =
    (for {
      tbl <- 0 until numTables
      planes = Similarity.lshPlanes(numPlanes, dim = 64, seed = 42L + tbl)
      p <- 0 until numPlanes
      i <- 0 until 64
    } yield s"($tbl, $p, ${i + 1}, ${planes(p)(i)})").mkString(", ")

  /** Shared oracle CTEs: per-vector (tbl, bucket) keys from the
    * embedded plane literals. */
  private def bucketsSql(numPlanes: Int, numTables: Int): String =
    s"""exp AS (
       |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
       |         generate_subscripts(embedding, 1) AS i
       |  FROM embeddings),
       |planes(tbl, p, i, w) AS (VALUES ${planeValuesSql(numPlanes, numTables)}),
       |contrib AS (
       |  SELECT e.vec_id, pl.tbl, pl.p, sum(e.x * pl.w) AS dt
       |  FROM exp e JOIN planes pl ON e.i = pl.i
       |  GROUP BY e.vec_id, pl.tbl, pl.p),
       |buckets AS (
       |  SELECT vec_id, tbl,
       |    CAST(sum(CASE WHEN dt >= 0 THEN power(2, p) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM contrib GROUP BY vec_id, tbl)""".stripMargin

  /** Hot-bucket star cap for the embedding LSH family — the
    * [[graft.ops.Dedup.pairsFromBands]] guard ported to plane
    * buckets, ON in the registry and mirrored exactly in the oracle.
    * Sized to trigger at sf0.1 (avg bucket ≈ corpus/2^planes = 250 >
    * 64) so the thinning is exercised and oracle-checked, while a
    * healthy production bucket (planes sized to the corpus) stays
    * under it. */
  private val EmbStarCap = 64

  val embeddingNearDup: Entry = Entry(
    "embedding_neardup_pairs",
    (s, dir) => Similarity.nearDupPairsLsh(
        t(s, dir, "embeddings"), threshold = 0.25,
        numPlanes = ndPlanes, numTables = ndTables,
        starAbove = EmbStarCap)
      .orderBy("a", "b"),
    Some(s"""WITH ${bucketsSql(ndPlanes, ndTables)},
        |sized AS (
        |  SELECT tbl, bucket, count(*) AS bn, min(vec_id) AS min_id
        |  FROM buckets GROUP BY tbl, bucket),
        |cands AS (
        |  SELECT DISTINCT a, b FROM (
        |    SELECT l.vec_id AS a, r.vec_id AS b
        |    FROM buckets l JOIN buckets r
        |      ON l.tbl = r.tbl AND l.bucket = r.bucket
        |      AND l.vec_id < r.vec_id
        |    JOIN sized s ON s.tbl = l.tbl AND s.bucket = l.bucket
        |    WHERE s.bn <= $EmbStarCap
        |    UNION ALL
        |    SELECT s.min_id AS a, x.vec_id AS b
        |    FROM buckets x JOIN sized s
        |      ON s.tbl = x.tbl AND s.bucket = x.bucket
        |    WHERE s.bn > $EmbStarCap AND x.vec_id <> s.min_id)),
        |norms AS (
        |  SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM exp GROUP BY vec_id),
        |dots AS (
        |  SELECT c.a, c.b, sum(ea.x * eb.x) AS dp
        |  FROM cands c
        |  JOIN exp ea ON ea.vec_id = c.a
        |  JOIN exp eb ON eb.vec_id = c.b AND ea.i = eb.i
        |  GROUP BY c.a, c.b)
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

  /** ANN via multi-table random-hyperplane LSH — oracle-exact since
    * round 2: the planes are seeded driver-side literals, so the
    * oracle rebuilds the same buckets, candidates, and ranking in SQL;
    * recall vs brute force is additionally asserted in OpsSpec. */
  val annLsh: Entry = Entry(
    "ann_lsh_topk",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.annTopK(emb, emb.where(col("vec_id") < 5), k = 5,
          numPlanes = 4)
        .select("qid", "rnk", "vid", "cos")
        .orderBy("qid", "rnk")
    },
    Some(s"""WITH ${bucketsSql(4, 4)},
        |cands AS (
        |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS vid
        |  FROM buckets q JOIN buckets c
        |    ON q.tbl = c.tbl AND q.bucket = c.bucket
        |    AND q.vec_id < 5 AND q.vec_id <> c.vec_id),
        |norms AS (
        |  SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM exp GROUP BY vec_id),
        |dots AS (
        |  SELECT cd.qid, cd.vid, sum(eq.x * ec.x) AS dp
        |  FROM cands cd
        |  JOIN exp eq ON eq.vec_id = cd.qid
        |  JOIN exp ec ON ec.vec_id = cd.vid AND eq.i = ec.i
        |  GROUP BY cd.qid, cd.vid),
        |scored AS (
        |  SELECT qid, vid, round(dp / (nq.nrm * nc.nrm), 4) AS cos
        |  FROM dots JOIN norms nq ON qid = nq.vec_id
        |  JOIN norms nc ON vid = nc.vec_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY qid
        |      ORDER BY cos DESC, vid) AS rnk
        |  FROM scored)
        |SELECT qid, rnk, vid, cos FROM ranked WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin))

  /** Oracle SQL for ivf_ann_topk, derived when the query runs: the
    * k-means training is deterministic (lowest-id seeds, 2 fixed
    * iterations), so the trained centroids become VALUES literals —
    * the dynamic extension of the seeded-plane trick. Entry.oracleFn
    * is read after Verify has executed the queries, so the literals
    * match the scale factor being verified. */
  @volatile private var ivfOracle: Option[String] = None

  /** IVF-style ANN: inverted lists by nearest trained centroid,
    * probes search their 4 closest of 16 lists. With the trained
    * centroids embedded as literals, the oracle reproduces list
    * assignment (rounded cosine, cent_id tiebreak) and the candidate
    * search exactly; recall vs brute force is additionally tested in
    * OpsSpec. */
  /** (cent_id, i, cx) VALUES rows for a collected (cent_id, cvec)
    * centroid frame — shared by the ivf and semantic-dedup dynamic
    * oracles. */
  private def centValuesSql(cents: org.apache.spark.sql.DataFrame): String =
    cents.collect().map { r =>
      val cid = r.get(0)
      val vec = r.getSeq[Float](1)
      vec.zipWithIndex
        .map { case (x, i) => s"($cid, ${i + 1}, ${x.toDouble})" }
        .mkString(", ")
    }.mkString(", ")

  /** The full IVF replay for a fixed centroid VALUES set — shared by
    * ivf_ann_topk (in-query training) and ivf_ann_persisted (index
    * built into a TableStore): assignment (rounded cosine, cent_id
    * tiebreak), nprobe=4 probed lists for vec_id < 5, candidate
    * search, top-5 rank. One text, two entries — the persisted search
    * must equal the in-query one given the same centroids, and
    * sharing the oracle makes that the checked contract. */
  private def ivfOracleSql(centValues: String,
                           candPred: String = "TRUE",
                           nprobeSql: String = "4",
                           extraCtes: String = ""): String =
    s"""WITH exp AS (
       |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
       |         generate_subscripts(embedding, 1) AS i
       |  FROM embeddings),
       |cent(cent_id, i, cx) AS (VALUES $centValues),$extraCtes
       |norms AS (
       |  SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM exp GROUP BY vec_id),
       |cnorms AS (
       |  SELECT cent_id, sqrt(sum(cx * cx)) AS cnrm FROM cent GROUP BY cent_id),
       |cdots AS (
       |  SELECT e.vec_id, c.cent_id, sum(e.x * c.cx) AS dp
       |  FROM exp e JOIN cent c ON e.i = c.i
       |  GROUP BY e.vec_id, c.cent_id),
       |cscore AS (
       |  SELECT vec_id, cent_id, round(dp / (n.nrm * cn.cnrm), 4) AS ccos
       |  FROM cdots d JOIN norms n USING (vec_id) JOIN cnorms cn USING (cent_id)),
       |assign AS (
       |  SELECT vid, cent_id FROM (
       |    SELECT vec_id AS vid, cent_id, row_number() OVER (PARTITION BY vec_id
       |        ORDER BY ccos DESC, cent_id) AS r
       |    FROM cscore) a JOIN embeddings em ON em.vec_id = a.vid
       |  WHERE r = 1 AND ($candPred)),
       |probes AS (
       |  SELECT vec_id AS qid, cent_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |        ORDER BY ccos DESC, cent_id) AS r
       |    FROM cscore WHERE vec_id < 5) WHERE r <= $nprobeSql),
       |cands AS (
       |  SELECT p.qid, a.vid FROM probes p JOIN assign a
       |  ON p.cent_id = a.cent_id WHERE p.qid <> a.vid),
       |dots AS (
       |  SELECT cd.qid, cd.vid, sum(eq.x * ec.x) AS dp
       |  FROM cands cd
       |  JOIN exp eq ON eq.vec_id = cd.qid
       |  JOIN exp ec ON ec.vec_id = cd.vid AND eq.i = ec.i
       |  GROUP BY cd.qid, cd.vid),
       |scored AS (
       |  SELECT qid, vid, round(dp / (nq.nrm * nc.nrm), 4) AS cos
       |  FROM dots JOIN norms nq ON qid = nq.vec_id
       |  JOIN norms nc ON vid = nc.vec_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY qid
       |      ORDER BY cos DESC, vid) AS rnk
       |  FROM scored)
       |SELECT qid, rnk, vid, cos FROM ranked WHERE rnk <= 5
       |ORDER BY qid, rnk""".stripMargin

  val ivfTopK: Entry = new Entry(
    "ivf_ann_topk",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = Similarity.kmeansCentroids(emb, nlist = 16, iterations = 2)
      val centValues = centValuesSql(cents)
      ivfOracle = Some(ivfOracleSql(centValues))
      Similarity.ivfSearch(emb, emb.where(col("vec_id") < 5), cents,
          k = 5, nprobe = 4)
        .select("qid", "rnk", "vid", "cos")
        .orderBy("qid", "rnk")
    },
    () => ivfOracle)

  @volatile private var ivfPersistedOracle: Option[String] = None

  /** PERSISTED IVF index, end to end: train + write
    * centroids/inverted lists into a TableStore
    * ([[graft.ops.VectorIndex.buildIvfIndex]] — lists
    * hive-partitioned by cent_id), then serve the same probes from
    * the stored index alone (no corpus touch; probed lists prune at
    * the partition level). Same parameters and determinism as
    * ivf_ann_topk, and the SAME oracle text over the read-back
    * centroid literals — the checked contract that a persisted search
    * equals the in-query one. Partition-pruning ratios are asserted
    * in VectorIndexSpec. */
  val ivfPersisted: Entry = new Entry(
    "ivf_ann_persisted",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val store = new graft.lake.TableStore(s,
        Queries.scratchDir("graft-ivfidx"))
      graft.ops.VectorIndex.buildIvfIndex(store, "emb_ivf", emb,
        nlist = 16, kmeansIters = 2)
      val cents = store.read(graft.ops.VectorIndex.centroidsTable("emb_ivf"))
      ivfPersistedOracle = Some(ivfOracleSql(centValuesSql(cents)))
      graft.ops.VectorIndex.searchIvfIndex(store, "emb_ivf",
          emb.where(col("vec_id") < 5), k = 5, nprobe = 4)
        .select("qid", "rnk", "vid", "cos")
        .orderBy("qid", "rnk")
    },
    () => ivfPersistedOracle)

  @volatile private var ivfIncrementalOracle: Option[String] = None

  /** INCREMENTALLY MAINTAINED IVF index: train + persist over the
    * even-id half of the corpus, then
    * [[graft.ops.VectorIndex.appendToIvfIndex]] the odd-id half —
    * O(batch) assignment against the stored centroids, an append
    * commit under the lists table's hive layout, no rebuild. Probes
    * then search the combined index. The oracle is the SAME shared
    * IVF replay text over the stored (even-half-trained) centroids,
    * assigning the WHOLE corpus — i.e. the checked contract is
    * build(a) + append(b) ≡ build(a ∪ b) given the same centroids,
    * which is exactly what makes append a sound maintenance move at
    * 100 TB (the daily embedding drop costs one assignment pass over
    * the batch, never a corpus re-read). */
  val ivfIncremental: Entry = new Entry(
    "ivf_ann_incremental",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val store = new graft.lake.TableStore(s,
        Queries.scratchDir("graft-ivfinc"))
      graft.ops.VectorIndex.buildIvfIndex(store, "emb_ivf",
        emb.where(col("vec_id") % 2 === 0), nlist = 16, kmeansIters = 2)
      graft.ops.VectorIndex.appendToIvfIndex(store, "emb_ivf",
        emb.where(col("vec_id") % 2 === 1))
      val cents = store.read(graft.ops.VectorIndex.centroidsTable("emb_ivf"))
      ivfIncrementalOracle = Some(ivfOracleSql(centValuesSql(cents)))
      graft.ops.VectorIndex.searchIvfIndex(store, "emb_ivf",
          emb.where(col("vec_id") < 5), k = 5, nprobe = 4)
        .select("qid", "rnk", "vid", "cos")
        .orderBy("qid", "rnk")
    },
    () => ivfIncrementalOracle)

  @volatile private var ivfStreamingOracle: Option[String] = None

  /** STREAMING-maintained IVF index on the oracle-checked path: train
    * on the even-id half, then deliver the odd half as two
    * foreachBatch micro-batches through
    * [[graft.streaming.StreamingVectorIndex.ingestBatch]] — each an
    * appendTxn carrying its batch id — and CRASH-REPLAY the second
    * batch. The replay must no-op (caller lastTxn guard + the
    * commit's in-claim revalidation); if it double-applied, every
    * duplicated candidate would score twice and the rank/hash compare
    * against the shared IVF replay oracle would fail. Same
    * centroids-as-literals oracle as the batch forms: stream ≡ batch
    * ≡ one-shot build is the checked contract, now including the
    * exactly-once leg. */
  val ivfStreamingIngest: Entry = new Entry(
    "ivf_ann_streaming_ingest",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val store = new graft.lake.TableStore(s,
        Queries.scratchDir("graft-ivfstream"))
      graft.ops.VectorIndex.buildIvfIndex(store, "emb_ivf",
        emb.where(col("vec_id") % 2 === 0), nlist = 16, kmeansIters = 2)
      val b0 = emb.where(col("vec_id") % 4 === 1)
      val b1 = emb.where(col("vec_id") % 4 === 3)
      graft.streaming.StreamingVectorIndex.ingestBatch(store, "emb_ivf",
        b0, batchId = 0L)
      graft.streaming.StreamingVectorIndex.ingestBatch(store, "emb_ivf",
        b1, batchId = 1L)
      // at-least-once redelivery after a simulated checkpoint loss
      graft.streaming.StreamingVectorIndex.ingestBatch(store, "emb_ivf",
        b1, batchId = 1L)
      val cents = store.read(graft.ops.VectorIndex.centroidsTable("emb_ivf"))
      ivfStreamingOracle = Some(ivfOracleSql(centValuesSql(cents)))
      graft.ops.VectorIndex.searchIvfIndex(store, "emb_ivf",
          emb.where(col("vec_id") < 5), k = 5, nprobe = 4)
        .select("qid", "rnk", "vid", "cos")
        .orderBy("qid", "rnk")
    },
    () => ivfStreamingOracle)

  @volatile private var ivfAfterDeleteOracle: Option[String] = None

  /** DELETE PROPAGATION into the persisted index: build over the full
    * corpus, purge ids ≡ 3 (mod 7) — the shape of a dedup purge or
    * CDC delete wave — via
    * [[graft.ops.VectorIndex.deleteFromIvfIndex]] (merge-on-read
    * equality deletes on the lists table: one O(keys) commit, zero
    * rewrite), then search. Checked contract: search-after-delete ≡
    * search over an index rebuilt from the survivors with the SAME
    * centroids (deletes never retrain) — the oracle is the shared
    * IVF replay with the candidate side restricted to survivors,
    * while probes still assign against the full centroid set. Without
    * the delete path the purged vectors would keep surfacing as
    * neighbors and every rank below them would shift — a hash miss. */
  val ivfAfterDelete: Entry = new Entry(
    "ivf_ann_after_delete",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val store = new graft.lake.TableStore(s,
        Queries.scratchDir("graft-ivfdel"))
      graft.ops.VectorIndex.buildIvfIndex(store, "emb_ivf", emb,
        nlist = 16, kmeansIters = 2)
      graft.ops.VectorIndex.deleteFromIvfIndex(store, "emb_ivf",
        emb.where(col("vec_id") % 7 === 3))
      val cents = store.read(graft.ops.VectorIndex.centroidsTable("emb_ivf"))
      ivfAfterDeleteOracle = Some(ivfOracleSql(centValuesSql(cents),
        candPred = "em.vec_id % 7 <> 3"))
      graft.ops.VectorIndex.searchIvfIndex(store, "emb_ivf",
          emb.where(col("vec_id") < 5), k = 5, nprobe = 4)
        .select("qid", "rnk", "vid", "cos")
        .orderBy("qid", "rnk")
    },
    () => ivfAfterDeleteOracle)

  @volatile private var ivfSyncedOracle: Option[String] = None

  /** INDEX FOLLOWS THE TABLE: build the index bound to a store-table
    * corpus version ([[graft.ops.VectorIndex.buildIvfIndexFromTable]]
    * records the version as a sync watermark), let the corpus evolve
    * through normal table commits (an append wave, then a DV DELETE —
    * the dedup-purge shape), then ONE
    * [[graft.ops.VectorIndex.syncIvfIndex]] call applies the change
    * feed: touched ids' old rows equality-delete, final states
    * re-assign and insert, and the corpus version rides the commit —
    * atomic, exactly-once under redelivery, O(changed data). The
    * oracle is the shared IVF replay over the stored (pre-append
    * trained) centroids with candidates restricted to the corpus's
    * final state — if the sync missed a delete, double-applied an
    * insert, or skipped the appended wave, the hash breaks. */
  val ivfSynced: Entry = new Entry(
    "ivf_ann_synced",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val store = new graft.lake.TableStore(s,
        Queries.scratchDir("graft-ivfsync"))
      store.create("corpus", emb.where(col("vec_id") % 2 === 0))
      graft.ops.VectorIndex.buildIvfIndexFromTable(store, "emb_ivf",
        "corpus", nlist = 16, kmeansIters = 2)
      store.append("corpus", emb.where(col("vec_id") % 2 === 1))
      store.deleteWhere("corpus", col("vec_id") % 7 === 3)
      graft.ops.VectorIndex.syncIvfIndex(store, "emb_ivf", "corpus")
      val cents = store.read(graft.ops.VectorIndex.centroidsTable("emb_ivf"))
      ivfSyncedOracle = Some(ivfOracleSql(centValuesSql(cents),
        candPred = "em.vec_id % 7 <> 3"))
      graft.ops.VectorIndex.searchIvfIndex(store, "emb_ivf",
          emb.where(col("vec_id") < 5), k = 5, nprobe = 4)
        .select("qid", "rnk", "vid", "cos")
        .orderBy("qid", "rnk")
    },
    () => ivfSyncedOracle)

  @volatile private var ivfFilteredOracle: Option[String] = None

  /** ATTRIBUTE-FILTERED ANN — "top-k within label < 5", the most
    * common production ANN query. The index is built with `label`
    * carried into the inverted lists
    * ([[graft.ops.VectorIndex.buildIvfIndex]] attrCols), and
    * [[graft.ops.VectorIndex.searchIvfIndexFiltered]] pushes the
    * predicate into the lists scan — candidates rank over the
    * SURVIVORS, so k never silently shrinks the way a post-filter
    * would. Probe widening rides along: measured selectivity s over
    * the lists, effective nprobe =
    * max(nprobe, min(nlist, ceil(nprobe / s))) — the oracle replays
    * the rule from the same counts (same IEEE arithmetic), then the
    * same replayed assignment/ranking restricted to matching
    * candidates. */
  val ivfFiltered: Entry = new Entry(
    "ivf_ann_filtered",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val store = new graft.lake.TableStore(s,
        Queries.scratchDir("graft-ivffil"))
      graft.ops.VectorIndex.buildIvfIndex(store, "emb_ivf", emb,
        nlist = 16, kmeansIters = 2, attrCols = Seq("label"))
      val cents = store.read(graft.ops.VectorIndex.centroidsTable("emb_ivf"))
      ivfFilteredOracle = Some(ivfOracleSql(centValuesSql(cents),
        candPred = "em.label < 5",
        nprobeSql = "(SELECT np FROM npv)",
        extraCtes = """
          |selv AS (
          |  -- both counts CAST to DOUBLE so DuckDB performs the same
          |  -- IEEE double division Spark does (DECIMAL-first division
          |  -- can land one probe off at a ceil() integer boundary)
          |  SELECT greatest(CAST(count(*) FILTER (WHERE label < 5) AS DOUBLE)
          |                    / CAST(count(*) AS DOUBLE), 1e-9) AS s
          |  FROM embeddings),
          |npv AS (
          |  SELECT greatest(4, least(16, CAST(ceil(4 / s) AS BIGINT))) AS np
          |  FROM selv),""".stripMargin))
      graft.ops.VectorIndex.searchIvfIndexFiltered(store, "emb_ivf",
          emb.where(col("vec_id") < 5), k = 5, nprobe = 4,
          filter = col("label") < 5)
        .select("qid", "rnk", "vid", "cos")
        .orderBy("qid", "rnk")
    },
    () => ivfFilteredOracle)

  @volatile private var ivfPqOracle: Option[String] = None

  /** (sub, cent_id, si, cx) VALUES rows for a collected codebook frame
    * — the book-side analog of [[centValuesSql]]. */
  private def bookValuesSql(books: org.apache.spark.sql.DataFrame): String =
    books.collect().map { r =>
      val cid = r.get(r.fieldIndex("cent_id"))
      val sub = r.getInt(r.fieldIndex("sub"))
      val vec = r.getSeq[Float](r.fieldIndex("cvec"))
      vec.zipWithIndex
        .map { case (x, i) => s"($sub, $cid, ${i + 1}, ${x.toDouble})" }
        .mkString(", ")
    }.mkString(", ")

  /** PERSISTED IVF-PQ index (Jégou et al.'s IVFADC, the
    * billion-vector serving shape): coarse k-means routes vectors to
    * inverted lists that store m-byte PQ CODES, not vectors —
    * [[graft.ops.VectorIndex.buildIvfPqIndex]] persists centroids +
    * codebooks + hive-partitioned codes, and the search reads ONLY
    * the probed code partitions, scoring candidates by asymmetric
    * distance (per-probe LUT broadcast into the code join). The
    * oracle replays BOTH deterministic quantizers from the read-back
    * literals: coarse assignment bounds the candidate set, PQ
    * encode + LUT reproduce every ADC score to the 4-dp rounding —
    * so probed-ANN-over-codes is exactly checkable end to end. */
  val ivfPqPersisted: Entry = new Entry(
    "ivfpq_ann_persisted",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val store = new graft.lake.TableStore(s,
        Queries.scratchDir("graft-ivfpq"))
      graft.ops.VectorIndex.buildIvfPqIndex(store, "emb_ivfpq", emb,
        nlist = 16, m = 8, ksub = 16, kmeansIters = 2)
      val cents = store.read(
        graft.ops.VectorIndex.centroidsTable("emb_ivfpq"))
      val books = store.read(graft.ops.VectorIndex.booksTable("emb_ivfpq"))
      ivfPqOracle = Some(ivfPqOracleSql(centValuesSql(cents),
        bookValuesSql(books)))
      graft.ops.VectorIndex.searchIvfPqIndex(store, "emb_ivfpq",
          emb.where(col("vec_id") < 5), k = 5, nprobe = 4, m = 8)
        .select("qid", "rnk", "vid", "cos_pq")
        .orderBy("qid", "rnk")
    },
    () => ivfPqOracle)

  /** The full IVF-PQ (IVFADC) replay for fixed coarse-centroid and
    * codebook VALUES sets — shared by the persisted, post-delete, and
    * attribute-filtered forms exactly as [[ivfOracleSql]] is shared
    * by the full-vector family. `candPred` restricts the CANDIDATE
    * side (the replayed `em` row of each assigned vector);
    * `nprobeSql`/`extraCtes` replay the probe-widening rule. */
  private def ivfPqOracleSql(centValues: String, bookValues: String,
                             candPred: String = "TRUE",
                             nprobeSql: String = "4",
                             extraCtes: String = ""): String =
    s"""WITH exp AS (
           |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
           |         generate_subscripts(embedding, 1) AS i
           |  FROM embeddings),
           |norms AS (
           |  SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM exp GROUP BY vec_id),
           |cent(cent_id, i, cx) AS (VALUES $centValues),$extraCtes
           |cnorms AS (
           |  SELECT cent_id, sqrt(sum(cx * cx)) AS cnrm FROM cent GROUP BY cent_id),
           |cdots AS (
           |  SELECT e.vec_id, c.cent_id, sum(e.x * c.cx) AS dp
           |  FROM exp e JOIN cent c ON e.i = c.i
           |  GROUP BY e.vec_id, c.cent_id),
           |cscore AS (
           |  SELECT vec_id, cent_id, round(dp / (n.nrm * cn.cnrm), 4) AS ccos
           |  FROM cdots d JOIN norms n USING (vec_id)
           |  JOIN cnorms cn USING (cent_id)),
           |assign AS (
           |  SELECT vid, cent_id FROM (
           |    SELECT vec_id AS vid, cent_id, row_number() OVER (PARTITION BY vec_id
           |        ORDER BY ccos DESC, cent_id) AS r
           |    FROM cscore) a JOIN embeddings em ON em.vec_id = a.vid
           |  WHERE r = 1 AND ($candPred)),
           |probes AS (
           |  SELECT vec_id AS qid, cent_id FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id
           |        ORDER BY ccos DESC, cent_id) AS r
           |    FROM cscore WHERE vec_id < 5) WHERE r <= $nprobeSql),
           |cands AS (
           |  SELECT p.qid, a.vid FROM probes p JOIN assign a
           |  ON p.cent_id = a.cent_id WHERE p.qid <> a.vid),
           |sub AS (
           |  SELECT vec_id, CAST((i - 1) // 8 AS INT) AS sub,
           |         ((i - 1) % 8) + 1 AS si, x
           |  FROM exp),
           |book(sub, cent_id, si, cx) AS (VALUES $bookValues),
           |bss AS (SELECT sub, cent_id, sum(cx * cx) AS ss
           |        FROM book GROUP BY sub, cent_id),
           |snorm AS (SELECT vec_id, sub, sqrt(sum(x * x)) AS sn
           |          FROM sub GROUP BY vec_id, sub),
           |sdot AS (
           |  SELECT s.vec_id, s.sub, b.cent_id, sum(s.x * b.cx) AS dp
           |  FROM sub s JOIN book b ON s.sub = b.sub AND s.si = b.si
           |  GROUP BY s.vec_id, s.sub, b.cent_id),
           |enc AS (
           |  SELECT vec_id AS vid, sub, cent_id AS code FROM (
           |    SELECT d.vec_id, d.sub, d.cent_id, row_number() OVER (
           |        PARTITION BY d.vec_id, d.sub
           |        ORDER BY round(dp / (sn.sn * sqrt(bs.ss)), 4) DESC,
           |                 d.cent_id) AS r
           |    FROM sdot d
           |    JOIN snorm sn ON d.vec_id = sn.vec_id AND d.sub = sn.sub
           |    JOIN bss bs ON d.sub = bs.sub AND d.cent_id = bs.cent_id)
           |  WHERE r = 1),
           |rnorm AS (
           |  SELECT enc.vid AS rvid, sqrt(sum(ss)) AS rn
           |  FROM enc JOIN bss ON enc.sub = bss.sub AND enc.code = bss.cent_id
           |  GROUP BY enc.vid),
           |lut AS (
           |  SELECT s.vec_id AS qid, s.sub, b.cent_id AS code,
           |         sum(s.x * b.cx) AS pd
           |  FROM sub s JOIN book b ON s.sub = b.sub AND s.si = b.si
           |  WHERE s.vec_id < 5
           |  GROUP BY s.vec_id, s.sub, b.cent_id),
           |adc AS (
           |  SELECT l.qid, e.vid, sum(l.pd) AS adp
           |  FROM enc e
           |  JOIN lut l ON e.sub = l.sub AND e.code = l.code
           |  JOIN cands c ON c.qid = l.qid AND c.vid = e.vid
           |  GROUP BY l.qid, e.vid),
           |scored AS (
           |  SELECT adc.qid, adc.vid,
           |         round(adp / (nq.nrm * rn.rn), 4) AS cos_pq
           |  FROM adc JOIN norms nq ON adc.qid = nq.vec_id
           |  JOIN rnorm rn ON adc.vid = rn.rvid),
           |ranked AS (
           |  SELECT *, row_number() OVER (PARTITION BY qid
           |      ORDER BY cos_pq DESC, vid) AS rnk
           |  FROM scored)
           |SELECT qid, rnk, vid, cos_pq FROM ranked WHERE rnk <= 5
           |ORDER BY qid, rnk""".stripMargin

  @volatile private var ivfPqDeleteOracle: Option[String] = None

  /** DELETE PROPAGATION on the code-compressed index
    * ([[graft.ops.VectorIndex.deleteFromIvfPqIndex]] — one equality
    * key removes all m code rows of a vector as a merge-on-read
    * commit): ivf_ann_after_delete's contract at the IVFADC storage
    * shape, under the shared PQ replay restricted to survivors. */
  val ivfPqAfterDelete: Entry = new Entry(
    "ivfpq_ann_after_delete",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val store = new graft.lake.TableStore(s,
        Queries.scratchDir("graft-ivfpqdel"))
      graft.ops.VectorIndex.buildIvfPqIndex(store, "emb_ivfpq", emb,
        nlist = 16, m = 8, ksub = 16, kmeansIters = 1)
      graft.ops.VectorIndex.deleteFromIvfPqIndex(store, "emb_ivfpq",
        emb.where(col("vec_id") % 7 === 3))
      val cents = store.read(
        graft.ops.VectorIndex.centroidsTable("emb_ivfpq"))
      val books = store.read(graft.ops.VectorIndex.booksTable("emb_ivfpq"))
      ivfPqDeleteOracle = Some(ivfPqOracleSql(centValuesSql(cents),
        bookValuesSql(books), candPred = "em.vec_id % 7 <> 3"))
      graft.ops.VectorIndex.searchIvfPqIndex(store, "emb_ivfpq",
          emb.where(col("vec_id") < 5), k = 5, nprobe = 4, m = 8)
        .select("qid", "rnk", "vid", "cos_pq")
        .orderBy("qid", "rnk")
    },
    () => ivfPqDeleteOracle)

  @volatile private var ivfPqFilteredOracle: Option[String] = None

  /** ATTRIBUTE-FILTERED IVF-PQ search: label rides the code rows
    * (narrow, RLE-compressed), the predicate pushes into the codes
    * scan, ranking runs over the survivors, and the probe set widens
    * by the same measured-selectivity rule as the full-vector form —
    * the production "top-k within lang/date" query at the
    * billion-vector storage shape. The oracle replays the widening
    * from the corpus-side counts (the code-row ratio equals the
    * vector ratio exactly: every vector holds exactly m rows). */
  val ivfPqFiltered: Entry = new Entry(
    "ivfpq_ann_filtered",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val store = new graft.lake.TableStore(s,
        Queries.scratchDir("graft-ivfpqfil"))
      graft.ops.VectorIndex.buildIvfPqIndex(store, "emb_ivfpq", emb,
        nlist = 16, m = 8, ksub = 16, kmeansIters = 1,
        attrCols = Seq("label"))
      val cents = store.read(
        graft.ops.VectorIndex.centroidsTable("emb_ivfpq"))
      val books = store.read(graft.ops.VectorIndex.booksTable("emb_ivfpq"))
      ivfPqFilteredOracle = Some(ivfPqOracleSql(centValuesSql(cents),
        bookValuesSql(books),
        candPred = "em.label < 5",
        nprobeSql = "(SELECT np FROM npv)",
        extraCtes = """
          |selv AS (
          |  -- both counts CAST to DOUBLE so DuckDB performs the same
          |  -- IEEE double division Spark does (DECIMAL-first division
          |  -- can land one probe off at a ceil() integer boundary)
          |  SELECT greatest(CAST(count(*) FILTER (WHERE label < 5) AS DOUBLE)
          |                    / CAST(count(*) AS DOUBLE), 1e-9) AS s
          |  FROM embeddings),
          |npv AS (
          |  SELECT greatest(4, least(16, CAST(ceil(4 / s) AS BIGINT))) AS np
          |  FROM selv),""".stripMargin))
      graft.ops.VectorIndex.searchIvfPqIndexFiltered(store, "emb_ivfpq",
          emb.where(col("vec_id") < 5), k = 5, nprobe = 4,
          filter = col("label") < 5, m = 8)
        .select("qid", "rnk", "vid", "cos_pq")
        .orderBy("qid", "rnk")
    },
    () => ivfPqFilteredOracle)

  @volatile private var ivfPqSyncedOracle: Option[String] = None

  /** [[ivfSynced]]'s pipeline at the IVFADC storage shape: the codes
    * table binds to the corpus version
    * ([[graft.ops.VectorIndex.buildIvfPqIndexFromTable]]), the corpus
    * takes an append wave and a DV-delete purge, and one
    * [[graft.ops.VectorIndex.syncIvfPqIndex]] applies the netted
    * change feed — touched ids' m code rows equality-delete, final
    * states re-encode against the STORED quantizers and insert,
    * atomically with the watermark. Oracle: the shared IVFADC replay
    * restricted to the corpus's final state. */
  val ivfPqSynced: Entry = new Entry(
    "ivfpq_ann_synced",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val store = new graft.lake.TableStore(s,
        Queries.scratchDir("graft-ivfpqsync"))
      store.create("corpus", emb.where(col("vec_id") % 2 === 0))
      graft.ops.VectorIndex.buildIvfPqIndexFromTable(store, "emb_ivfpq",
        "corpus", nlist = 16, m = 8, ksub = 16, kmeansIters = 1)
      store.append("corpus", emb.where(col("vec_id") % 2 === 1))
      store.deleteWhere("corpus", col("vec_id") % 7 === 3)
      graft.ops.VectorIndex.syncIvfPqIndex(store, "emb_ivfpq", "corpus",
        m = 8)
      val cents = store.read(
        graft.ops.VectorIndex.centroidsTable("emb_ivfpq"))
      val books = store.read(graft.ops.VectorIndex.booksTable("emb_ivfpq"))
      ivfPqSyncedOracle = Some(ivfPqOracleSql(centValuesSql(cents),
        bookValuesSql(books), candPred = "em.vec_id % 7 <> 3"))
      graft.ops.VectorIndex.searchIvfPqIndex(store, "emb_ivfpq",
          emb.where(col("vec_id") < 5), k = 5, nprobe = 4, m = 8)
        .select("qid", "rnk", "vid", "cos_pq")
        .orderBy("qid", "rnk")
    },
    () => ivfPqSyncedOracle)

  /** Oracle for semantic_dedup_prune, derived at run time like
    * ivf_ann_topk's: the deterministic trained centroids become VALUES
    * literals, so the oracle replays assignment (rounded cosine,
    * cent_id tiebreak), the within-cluster pair scores, and the
    * minimal-id keep policy exactly. */
  @volatile private var semOracle: Option[String] = None
  private val sdTau = 0.4

  /** SemDeDup semantic pruning over the embedding corpus: k-means
    * clusters as the candidate blocks, drop every vector with a
    * lower-id near-duplicate (cosine ≥ 0.4) in its cluster. Pairwise
    * work is bounded by cluster size — the scale story for semantic
    * dedup at 100 TB. One row per vector with its cluster and keep
    * flag. */
  val semanticDedup: Entry = new Entry(
    "semantic_dedup_prune",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = Similarity.kmeansCentroids(emb, nlist = 16, iterations = 2)
      semOracle = Some(
        s"""WITH exp AS (
           |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
           |         generate_subscripts(embedding, 1) AS i
           |  FROM embeddings),
           |cent(cent_id, i, cx) AS (VALUES ${centValuesSql(cents)}),
           |norms AS (
           |  SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM exp GROUP BY vec_id),
           |cnorms AS (
           |  SELECT cent_id, sqrt(sum(cx * cx)) AS cnrm FROM cent GROUP BY cent_id),
           |cdots AS (
           |  SELECT e.vec_id, c.cent_id, sum(e.x * c.cx) AS dp
           |  FROM exp e JOIN cent c ON e.i = c.i
           |  GROUP BY e.vec_id, c.cent_id),
           |cscore AS (
           |  SELECT vec_id, cent_id, round(dp / (n.nrm * cn.cnrm), 4) AS ccos
           |  FROM cdots d JOIN norms n USING (vec_id) JOIN cnorms cn USING (cent_id)),
           |assign AS (
           |  SELECT vec_id, cent_id FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id
           |        ORDER BY ccos DESC, cent_id) AS r
           |    FROM cscore) WHERE r = 1),
           |pdots AS (
           |  SELECT a.vec_id AS a, b.vec_id AS b, sum(ea.x * eb.x) AS dp
           |  FROM assign a JOIN assign b
           |    ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
           |  JOIN exp ea ON ea.vec_id = a.vec_id
           |  JOIN exp eb ON eb.vec_id = b.vec_id AND ea.i = eb.i
           |  GROUP BY a.vec_id, b.vec_id),
           |dropped AS (
           |  SELECT DISTINCT d.b
           |  FROM pdots d JOIN norms na ON d.a = na.vec_id
           |  JOIN norms nb ON d.b = nb.vec_id
           |  WHERE round(d.dp / (na.nrm * nb.nrm), 4) >= $sdTau)
           |SELECT a.vec_id, CAST(a.cent_id AS BIGINT) AS cent_id,
           |  CAST(dr.b IS NULL AS BIGINT) AS keep
           |FROM assign a LEFT JOIN dropped dr ON a.vec_id = dr.b
           |ORDER BY vec_id""".stripMargin)
      Similarity.semDedup(emb, cents, sdTau).orderBy("vec_id")
    },
    () => semOracle)

  /** Int8 quantization quality report: per label, the worst absolute
    * reconstruction error and the worst original↔reconstructed cosine
    * — the check run before committing a corpus to compressed storage.
    * Max/min aggregates only (order-free), per-row values rounded
    * before aggregation, so the compare is exact. */
  val quantizationError: Entry = Entry(
    "embedding_quantization_error",
    (s, dir) => {
      val q = Similarity.quantizeInt8(t(s, dir, "embeddings"))
      val recon = Similarity.dequantize(col("q_scale"), col("q_codes"))
      val err = aggregate(
        zip_with(col("embedding"), recon,
          (a, b) => abs(a.cast("double") - b)),
        lit(0.0), (acc, v) => greatest(acc, v))
      val dot = aggregate(
        zip_with(col("embedding"), recon,
          (a, b) => a.cast("double") * b),
        lit(0.0), (acc, v) => acc + v)
      def norm2(v: org.apache.spark.sql.Column,
                f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
        aggregate(v, lit(0.0), (acc, x) => acc + f(x) * f(x))
      val cos = dot / sqrt(norm2(col("embedding"), _.cast("double")) *
        norm2(recon, identity))
      q.select(col("label"), round(err, 6).as("e"), round(cos, 4).as("c"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"), max("e").as("max_err"),
          min("c").as("min_cos"))
        .orderBy("label")
    },
    Some("""WITH q AS (
        |  SELECT label,
        |    greatest(list_max([abs(CAST(x AS DOUBLE)) FOR x IN embedding]),
        |             1e-12) AS s,
        |    embedding
        |  FROM embeddings),
        |r AS (
        |  SELECT label,
        |    round(list_max([abs(CAST(embedding[i] AS DOUBLE)
        |      - round(CAST(embedding[i] AS DOUBLE) / s * 127, 0) * s / 127)
        |      FOR i IN range(1, len(embedding) + 1)]), 6) AS e,
        |    round(
        |      list_sum([CAST(embedding[i] AS DOUBLE)
        |        * (round(CAST(embedding[i] AS DOUBLE) / s * 127, 0) * s / 127)
        |        FOR i IN range(1, len(embedding) + 1)])
        |      / sqrt(list_sum([CAST(x AS DOUBLE) * x FOR x IN embedding])
        |        * list_sum([pow(round(CAST(embedding[i] AS DOUBLE) / s * 127, 0)
        |            * s / 127, 2)
        |          FOR i IN range(1, len(embedding) + 1)])), 4) AS c
        |  FROM q)
        |SELECT label, count(*) AS n, max(e) AS max_err, min(c) AS min_cos
        |FROM r GROUP BY label ORDER BY label""".stripMargin))

  /** Top-k retrieval over the int8-QUANTIZED corpus (float probes,
    * dequantized-on-the-fly corpus vectors) — the compressed-storage
    * search path: at 100 TB the corpus is stored as int8 codes (4x
    * less IO) and only probe-side floats stay full precision. The
    * oracle replays quantize→dequantize→cosine→rank exactly, so the
    * small ranking differences vs the float corpus are pinned, not
    * approximated. */
  val quantizedTopK: Entry = Entry(
    "quantized_ann_topk",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val qcorpus = Similarity.quantizeInt8(emb)
        .select(col("vec_id"),
          Similarity.dequantize(col("q_scale"), col("q_codes")).as("embedding"))
      // float probes against the double reconstructed corpus — the
      // mixed-width mode graft_dot supports natively
      Similarity.bruteForceTopK(qcorpus, emb.where(col("vec_id") < 5), k = 5)
        .select("qid", "rnk", "vid", "cos")
        .orderBy("qid", "rnk")
    },
    Some("""WITH qe AS (
        |  SELECT vec_id,
        |    greatest(list_max([abs(CAST(x AS DOUBLE)) FOR x IN embedding]),
        |             1e-12) AS s,
        |    embedding
        |  FROM embeddings),
        |recon AS (
        |  SELECT vec_id,
        |    [round(CAST(embedding[i] AS DOUBLE) / s * 127, 0) * s / 127
        |     FOR i IN range(1, len(embedding) + 1)] AS v
        |  FROM qe),
        |cexp AS (
        |  SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) AS x
        |  FROM recon),
        |pexp AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings WHERE vec_id < 5),
        |cnorms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM cexp GROUP BY vec_id),
        |pnorms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM pexp GROUP BY vec_id),
        |dots AS (
        |  SELECT p.vec_id AS qid, c.vec_id AS vid, sum(p.x * c.x) AS dp
        |  FROM pexp p JOIN cexp c ON p.i = c.i
        |  WHERE p.vec_id <> c.vec_id
        |  GROUP BY p.vec_id, c.vec_id),
        |scored AS (
        |  SELECT qid, vid, round(dp / (pn.nrm * cn.nrm), 4) AS cos
        |  FROM dots JOIN pnorms pn ON qid = pn.vec_id
        |  JOIN cnorms cn ON vid = cn.vec_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY qid
        |      ORDER BY cos DESC, vid) AS rnk
        |  FROM scored)
        |SELECT qid, rnk, vid, cos FROM ranked WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin))

  @volatile private var pqOracle: Option[String] = None

  /** Product-quantization ADC search (Similarity.pqTrain/pqEncode/
    * pqTopK): 64-dim floats become 8 four-bit codes (32x compression);
    * probes score candidates through a per-probe dot-product LUT
    * without ever decoding the corpus. The deterministic per-subspace
    * codebooks embed as VALUES literals (the IVF dynamic-oracle
    * trick), so encoding, reconstruction norms, ADC sums and ranking
    * are all reproduced exactly; recall vs brute force is additionally
    * tested in OpsSpec. */
  val pqTopK: Entry = new Entry(
    "pq_ann_topk",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      // 1 Lloyd iteration: this entry pays PQ TRAINING in-query (the
      // persisted ivfpq lifecycle covers the full-build path), and the
      // second iteration bought no ranking-quality difference the
      // oracle could see while costing a full corpus materialization —
      // it kept this query in the bench's slowest-5 since round 4. The
      // oracle replays from the read-back books, so it re-derives.
      val books = Similarity.pqTrain(emb, m = 8, ksub = 16, iterations = 1)
      val bookValues = books.collect().map { r =>
        val cid = r.get(r.fieldIndex("cent_id"))
        val sub = r.getInt(r.fieldIndex("sub"))
        val vec = r.getSeq[Float](r.fieldIndex("cvec"))
        vec.zipWithIndex
          .map { case (x, i) => s"($sub, $cid, ${i + 1}, ${x.toDouble})" }
          .mkString(", ")
      }.mkString(", ")
      pqOracle = Some(
        s"""WITH exp AS (
           |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
           |         generate_subscripts(embedding, 1) AS i
           |  FROM embeddings),
           |sub AS (
           |  SELECT vec_id, CAST((i - 1) // 8 AS INT) AS sub,
           |         ((i - 1) % 8) + 1 AS si, x
           |  FROM exp),
           |book(sub, cent_id, si, cx) AS (VALUES $bookValues),
           |bss AS (SELECT sub, cent_id, sum(cx * cx) AS ss
           |        FROM book GROUP BY sub, cent_id),
           |snorm AS (SELECT vec_id, sub, sqrt(sum(x * x)) AS sn
           |          FROM sub GROUP BY vec_id, sub),
           |sdot AS (
           |  SELECT s.vec_id, s.sub, b.cent_id, sum(s.x * b.cx) AS dp
           |  FROM sub s JOIN book b ON s.sub = b.sub AND s.si = b.si
           |  GROUP BY s.vec_id, s.sub, b.cent_id),
           |enc AS (
           |  SELECT vec_id AS vid, sub, cent_id AS code FROM (
           |    SELECT d.vec_id, d.sub, d.cent_id, row_number() OVER (
           |        PARTITION BY d.vec_id, d.sub
           |        ORDER BY round(dp / (sn.sn * sqrt(bs.ss)), 4) DESC,
           |                 d.cent_id) AS r
           |    FROM sdot d
           |    JOIN snorm sn ON d.vec_id = sn.vec_id AND d.sub = sn.sub
           |    JOIN bss bs ON d.sub = bs.sub AND d.cent_id = bs.cent_id)
           |  WHERE r = 1),
           |rnorm AS (
           |  SELECT enc.vid AS rvid, sqrt(sum(ss)) AS rn
           |  FROM enc JOIN bss ON enc.sub = bss.sub AND enc.code = bss.cent_id
           |  GROUP BY enc.vid),
           |lut AS (
           |  SELECT s.vec_id AS qid, s.sub, b.cent_id AS code,
           |         sum(s.x * b.cx) AS pd
           |  FROM sub s JOIN book b ON s.sub = b.sub AND s.si = b.si
           |  WHERE s.vec_id < 5
           |  GROUP BY s.vec_id, s.sub, b.cent_id),
           |adc AS (
           |  SELECT l.qid, e.vid, sum(l.pd) AS adp
           |  FROM enc e JOIN lut l ON e.sub = l.sub AND e.code = l.code
           |  WHERE l.qid <> e.vid
           |  GROUP BY l.qid, e.vid),
           |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm
           |          FROM exp GROUP BY vec_id),
           |scored AS (
           |  SELECT qid, vid, round(adp / (nq.nrm * r.rn), 4) AS cos_pq
           |  FROM adc JOIN norms nq ON qid = nq.vec_id
           |  JOIN rnorm r ON vid = r.rvid),
           |ranked AS (
           |  SELECT *, row_number() OVER (PARTITION BY qid
           |      ORDER BY cos_pq DESC, vid) AS rnk
           |  FROM scored)
           |SELECT qid, rnk, vid, cos_pq FROM ranked WHERE rnk <= 5
           |ORDER BY qid, rnk""".stripMargin)
      Similarity.pqTopK(emb, emb.where(col("vec_id") < 5), books,
          m = 8, k = 5)
        .select("qid", "rnk", "vid", "cos_pq")
        .orderBy("qid", "rnk")
    },
    () => pqOracle)

  /** Hard-negative mining for contrastive training: per anchor, the
    * nearest candidates by cosine whose LABEL differs (and that are
    * not near-duplicates, cos < 0.95) — the pairs that teach an
    * embedding model the most. Composes the broadcast-probe top-k
    * pool (k=50 per anchor, corpus never shuffles) with a label
    * anti-predicate and a per-anchor re-rank; both rank windows
    * partition by the anchor id. */
  val hardNegatives: Entry = Entry(
    "hard_negative_mining",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val emb = t(s, dir, "embeddings")
      val lbl = emb.select(col("vec_id"), col("label"))
      val pool = Similarity
        .bruteForceTopK(emb, emb.where(col("vec_id") < 5), k = 50)
      pool
        .join(lbl.select(col("vec_id").as("qid"), col("label").as("q_label")),
          "qid")
        .join(lbl.select(col("vec_id").as("vid"), col("label").as("v_label")),
          "vid")
        .where(col("q_label") =!= col("v_label") && col("cos") < 0.95)
        .withColumn("neg_rnk", row_number().over(
          Window.partitionBy("qid").orderBy(col("cos").desc, col("vid"))))
        .where(col("neg_rnk") <= 10)
        .select("qid", "neg_rnk", "vid", "cos", "v_label")
        .orderBy("qid", "neg_rnk")
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
        |  SELECT qid, vid, round(dp / (nq.nrm * nc.nrm), 4) AS cos
        |  FROM dots JOIN norms nq ON qid = nq.vec_id
        |  JOIN norms nc ON vid = nc.vec_id),
        |pool AS (
        |  SELECT *, row_number() OVER (PARTITION BY qid
        |      ORDER BY cos DESC, vid) AS rnk
        |  FROM scored),
        |neg AS (
        |  SELECT p.qid, p.vid, p.cos, el.label AS v_label,
        |    row_number() OVER (PARTITION BY p.qid
        |      ORDER BY p.cos DESC, p.vid) AS neg_rnk
        |  FROM pool p
        |  JOIN embeddings eq ON p.qid = eq.vec_id
        |  JOIN embeddings el ON p.vid = el.vec_id
        |  WHERE p.rnk <= 50 AND eq.label <> el.label AND p.cos < 0.95)
        |SELECT qid, neg_rnk, vid, cos, v_label FROM neg
        |WHERE neg_rnk <= 10 ORDER BY qid, neg_rnk""".stripMargin))

  /** MMR-diversified top-k (Carbonell & Goldstein '98): a second-stage
    * re-ranker over each query's top-20 relevance candidates, greedily
    * maximizing λ·rel − (1−λ)·max-sim-to-picked
    * ([[Similarity.mmrSelect]] — per-query groups, bounded state).
    * Everything runs in the int8-quantized integer domain (int dots,
    * λ=0.5 halves) so scores are EXACT doubles in any engine and the
    * oracle — a recursive CTE replaying the same greedy selection with
    * list lambdas — matches bit-for-bit, argmax ties included. */
  val mmrTopK: Entry = Entry(
    "mmr_diversified_topk",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val q = Similarity.quantizeInt8(t(s, dir, "embeddings"))
        .select(col("vec_id"),
          transform(col("q_codes"), c => c.cast("double")).as("codes"))
      val probes = q.where(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("codes").as("pcodes"))
      val rel = q.join(broadcast(probes), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("vid"),
          Similarity.dot(col("pcodes"), col("codes")).as("rel"), col("codes"))
      val cand = rel.withColumn("rn", row_number().over(
          Window.partitionBy("qid").orderBy(col("rel").desc, col("vid"))))
        .where(col("rn") <= 20)
        .select("qid", "vid", "rel", "codes")
      Similarity.mmrSelect(cand, k = 8, lambda = 0.5, vecCol = "codes")
        .toDF()
        .select(col("qid"), col("rnk").cast("long").as("rnk"), col("vid"),
          round(col("mmr"), 4).as("mmr"))
        .orderBy("qid", "rnk")
    },
    Some("""WITH RECURSIVE
        |q AS (
        |  SELECT vec_id,
        |    [round(CAST(x AS DOUBLE) /
        |       greatest(list_max([abs(CAST(y AS DOUBLE)) FOR y IN embedding]),
        |                1e-12) * 127, 0) FOR x IN embedding] AS codes
        |  FROM embeddings),
        |cand AS (
        |  SELECT p.vec_id AS qid, c.vec_id AS vid,
        |         list_dot_product(p.codes, c.codes) AS rel, c.codes AS codes
        |  FROM q p JOIN q c ON p.vec_id < 3 AND c.vec_id <> p.vec_id
        |  QUALIFY row_number() OVER (PARTITION BY p.vec_id
        |      ORDER BY rel DESC, c.vec_id) <= 20),
        |sel AS (
        |  (SELECT qid, 1 AS rnk, vid, 0.5 * rel AS mmr,
        |          [vid] AS vids, [codes] AS picked
        |   FROM (SELECT *, row_number() OVER (PARTITION BY qid
        |             ORDER BY rel DESC, vid) AS rn FROM cand)
        |   WHERE rn = 1)
        |  UNION ALL
        |  (SELECT qid, rnk + 1, vid, mmr,
        |          list_append(vids, vid), list_append(picked, codes)
        |   FROM (
        |     SELECT s.qid, s.rnk, c.vid, c.codes, s.vids, s.picked,
        |       0.5 * c.rel - 0.5 * list_max(list_transform(s.picked,
        |         p -> list_dot_product(p, c.codes))) AS mmr,
        |       row_number() OVER (PARTITION BY s.qid ORDER BY
        |         0.5 * c.rel - 0.5 * list_max(list_transform(s.picked,
        |           p -> list_dot_product(p, c.codes))) DESC, c.vid) AS rn
        |     FROM sel s JOIN cand c
        |       ON c.qid = s.qid AND NOT list_contains(s.vids, c.vid)
        |     WHERE s.rnk < 8)
        |   WHERE rn = 1))
        |SELECT qid, CAST(rnk AS BIGINT) AS rnk, vid, round(mmr, 4) AS mmr
        |FROM sel ORDER BY qid, rnk""".stripMargin))

  // -------------------------------------------------------------------
  // Build-once / serve-many split (round 15 — BASELINE.md's open bench
  // item): the lifecycle ANN entries re-run train+commit inside every
  // timed rep, so serve-path improvements drown in build noise. These
  // variants time ONLY the search, against an index prebuilt once per
  // (process, scale-factor dir) — build AMORTIZATION, not result
  // caching: the prebuild computes from the parquet inputs inside this
  // same run (nothing persists across runs — scratch dirs are reaped
  // on exit), and every timed search still scans the STORED index and
  // the probe frame and re-ranks from scratch. The oracle is the same
  // shared replay the persisted forms use, over the prebuilt index's
  // read-back literals — first-class oracle-checked queries, not
  // bench-only timers.
  // -------------------------------------------------------------------
  private val serveRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def serveStore(s: org.apache.spark.sql.SparkSession,
                         dir: String): graft.lake.TableStore = {
    val root = serveRoots.computeIfAbsent(dir, _ => {
      val r = Queries.scratchDir("graft-annserve")
      val store = new graft.lake.TableStore(s, r)
      val emb = t(s, dir, "embeddings")
      graft.ops.VectorIndex.buildIvfIndex(store, "emb_ivf", emb,
        nlist = 16, kmeansIters = 2)
      graft.ops.VectorIndex.buildIvfPqIndex(store, "emb_ivfpq", emb,
        nlist = 16, m = 8, ksub = 16, kmeansIters = 2)
      r
    })
    new graft.lake.TableStore(s, root)
  }

  @volatile private var ivfServeOracle: Option[String] = None

  /** SERVE-ONLY IVF search — ivf_ann_persisted's search half against
    * the per-run prebuilt index: what a query node pays per request
    * once the index exists. Same parameters, same shared IVF replay
    * oracle over the read-back centroids (training is deterministic,
    * so the results equal ivf_ann_persisted's). */
  val ivfServe: Entry = new Entry(
    "ivf_ann_serve",
    (s, dir) => {
      val store = serveStore(s, dir)
      val cents = store.read(graft.ops.VectorIndex.centroidsTable("emb_ivf"))
      ivfServeOracle = Some(ivfOracleSql(centValuesSql(cents)))
      graft.ops.VectorIndex.searchIvfIndex(store, "emb_ivf",
          t(s, dir, "embeddings").where(col("vec_id") < 5), k = 5, nprobe = 4)
        .select("qid", "rnk", "vid", "cos")
        .orderBy("qid", "rnk")
    },
    () => ivfServeOracle)

  @volatile private var ivfPqServeOracle: Option[String] = None

  /** SERVE-ONLY IVF-PQ (IVFADC) search against the prebuilt index —
    * ivfpq_ann_persisted's search half; same shared replay oracle
    * over the read-back centroid + codebook literals. */
  val ivfPqServe: Entry = new Entry(
    "ivfpq_ann_serve",
    (s, dir) => {
      val store = serveStore(s, dir)
      val cents = store.read(
        graft.ops.VectorIndex.centroidsTable("emb_ivfpq"))
      val books = store.read(graft.ops.VectorIndex.booksTable("emb_ivfpq"))
      ivfPqServeOracle = Some(ivfPqOracleSql(centValuesSql(cents),
        bookValuesSql(books)))
      graft.ops.VectorIndex.searchIvfPqIndex(store, "emb_ivfpq",
          t(s, dir, "embeddings").where(col("vec_id") < 5), k = 5,
          nprobe = 4, m = 8)
        .select("qid", "rnk", "vid", "cos_pq")
        .orderBy("qid", "rnk")
    },
    () => ivfPqServeOracle)

  val entries: Seq[Entry] = Seq(cosineTopK, embeddingNearDup,
    labelCentroids, annLsh, ivfTopK, ivfPersisted, ivfIncremental,
    ivfStreamingIngest, ivfAfterDelete, ivfFiltered, ivfSynced,
    ivfPqPersisted, ivfPqAfterDelete, ivfPqFiltered, ivfPqSynced,
    semanticDedup,
    quantizationError,
    quantizedTopK, pqTopK, hardNegatives, mmrTopK,
    ivfServe, ivfPqServe)
}
