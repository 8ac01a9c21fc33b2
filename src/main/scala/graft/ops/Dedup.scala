package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines: exact
  * content-hash dedup and MinHash-LSH near-dedup (north-star extension).
  *
  * Scale design (100 TB): every stage is a hash-partitioned groupBy or
  * equi-join — no pairwise O(n^2) anywhere. Exact dedup shuffles once on
  * the content hash. MinHash: per-doc signature computation is
  * embarrassingly parallel (explode → groupBy doc), candidate
  * generation joins on LSH band keys so only same-bucket docs ever
  * meet, and bucket skew is bounded because band keys are md5s.
  */
object Dedup {

  /** Exact dedup: one representative (min id) per distinct content hash.
    * groupBy(md5) = single shuffle on the hash — the 100 TB plan. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Prime modulus of the minhash permutation family (2^31 - 1). */
  val MinhashP = 2147483647L

  /** Seeded (a, b) constants of the affine permutations
    * `p_i(h) = (a_i * h + b_i) mod P` — driver-side literals so the
    * DuckDB oracle can embed the identical values. */
  def minhashAB(numHashes: Int, seed: Long = 7L): Seq[(Long, Long)] = {
    val r = new scala.util.Random(seed)
    Seq.fill(numHashes)(
      (1L + r.nextInt((MinhashP - 1).toInt).toLong,
        r.nextInt(MinhashP.toInt).toLong))
  }

  /** 48-bit shingle hash: the first 12 hex chars of md5 as an integer,
    * reduced mod P. 12 digits keep the digit-wise decode on the oracle
    * side double-exact (max 16^12 - 1 < 2^53); md5 computes
    * identically in any engine. Shared by the batch, streaming, and
    * winnowing paths — oracle parity depends on ONE definition. */
  private[graft] def shingleHash(shingle: Column): Column =
    conv(substring(md5(shingle), 1, 12), 16, 10).cast("long") % MinhashP

  /** MinHash signature: minhash_i(doc) = min over shingles of
    * `(a_i * h(shingle) + b_i) mod P`, with h = a 48-bit md5-derived
    * integer — ONE md5 per shingle feeding all `numHashes`
    * permutations (8x fewer hash evaluations than hashing per
    * permutation), and every step integer-exact and reproducible in
    * the oracle engine.
    *
    * Shape: explode shingles once, then ONE hash-partitioned groupBy
    * with `numHashes` codegen'd min aggregates — partial mins combine
    * map-side, so the shuffle carries only numHashes longs per doc
    * regardless of document size. (A pure-HOF per-row variant was 4x
    * slower: HOF md5 transforms don't codegen and projection collapse
    * re-evaluates them per downstream reference.)
    *
    * Returns (idCol, sig: Array[String]) with sig(i) = minhash_i
    * (stringified, the banding currency).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int, numHashes: Int): DataFrame = {
    val ab = minhashAB(numHashes)
    val sh = df.select(col(idCol),
        explode(TextOps.shingles(col(textCol), shingleN)).as("shingle"))
      .select(col(idCol), shingleHash(col("shingle")).as("hh"))
    val mins = (0 until numHashes).map { i =>
      val (a, b) = ab(i)
      min((col("hh") * a + b) % MinhashP).as(s"mh_$i")
    }
    sh.groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol),
        array((0 until numHashes).map(i =>
          col(s"mh_$i").cast("string")): _*).as("sig"))
  }

  /** LSH banding: group `rowsPerBand` consecutive minhashes into a band
    * key (md5 of "h:minhash" pairs joined in h order — identical to the
    * oracle's lexicographic string_agg for single-digit h). Returns
    * (idCol, band: Int, band_key: String), `numHashes/rowsPerBand`
    * rows per doc. */
  def lshBands(signatures: DataFrame, idCol: String, numHashes: Int,
               rowsPerBand: Int): DataFrame = {
    require(numHashes <= 10, "band-key ordering assumes single-digit h")
    val numBands = numHashes / rowsPerBand
    val bandStructs = transform(sequence(lit(0), lit(numBands - 1)), b =>
      struct(b.as("band"),
        md5(concat_ws("|", transform(
          sequence(b * rowsPerBand, (b + 1) * rowsPerBand - 1),
          h => concat_ws(":", h.cast("string"),
            element_at(col("sig"), h + 1))))).as("band_key")))
    signatures.select(col(idCol), explode(bandStructs).as("x"))
      .select(col(idCol), col("x.band").as("band"), col("x.band_key").as("band_key"))
  }

  /** Shingle → signature → band pipeline in one call: the
    * (idCol, band, band_key) frame every candidate-generation path
    * joins on. */
  def bandsOf(df: DataFrame, idCol: String, textCol: String,
              shingleN: Int = 3, numHashes: Int = 8,
              rowsPerBand: Int = 2): DataFrame =
    lshBands(minhashSignatures(df, idCol, textCol, shingleN, numHashes),
      idCol, numHashes, rowsPerBand)

  /** Candidate pairs (a < b) from a prebuilt band frame — self-join on
    * band_key, so only same-bucket docs meet.
    *
    * `starAbove` is the hot-bucket guard for duplicate-heavy corpora:
    * a band bucket of m members emits m(m−1)/2 pairs — one bucket of
    * 1M boilerplate near-copies is 5·10^11 rows, the quadratic that
    * kills LSH at 100 TB. Buckets larger than the cap instead emit a
    * STAR (bucket-min paired with every other member, m−1 pairs):
    * connectivity — what grouping/dedup consumes — is preserved
    * exactly (every member still reaches the same component), only
    * the exhaustive pair list inside oversized buckets is thinned.
    * The default (MaxValue) keeps the exact all-pairs plan with no
    * extra aggregate. */
  def pairsFromBands(bands: DataFrame, idCol: String,
                     starAbove: Int = Int.MaxValue): DataFrame = {
    if (starAbove == Int.MaxValue) {
      val l = bands.select(col(idCol).as("a"), col("band"), col("band_key"))
      val r = bands.select(col(idCol).as("b"), col("band").as("band_r"),
        col("band_key").as("band_key_r"))
      l.join(r, col("band") === col("band_r") &&
          col("band_key") === col("band_key_r") && col("a") < col("b"))
        .select("a", "b").distinct()
    } else {
      require(starAbove >= 2, "starAbove must be >= 2")
      // bucket size + min via groupBy + join (NOT a window): the
      // aggregated side is tiny (one row per bucket) so AQE
      // broadcasts it back — one shuffle of the band frame and no
      // per-partition sort; a window form was measured same-or-worse
      // at sf0.1 because it forces that sort on the full frame
      val sized = bands.groupBy("band", "band_key")
        .agg(count(lit(1)).as("__bn"), min(col(idCol)).as("__min_id"))
      val tagged = bands.join(sized, Seq("band", "band_key"))
      val small = tagged.where(col("__bn") <= starAbove)
      val l = small.select(col(idCol).as("a"), col("band"), col("band_key"))
      val r = small.select(col(idCol).as("b"), col("band").as("band_r"),
        col("band_key").as("band_key_r"))
      val allPairs = l.join(r, col("band") === col("band_r") &&
          col("band_key") === col("band_key_r") && col("a") < col("b"))
        .select("a", "b")
      val star = tagged.where(col("__bn") > starAbove &&
          col(idCol) =!= col("__min_id"))
        .select(col("__min_id").as("a"), col(idCol).as("b"))
      allPairs.unionByName(star).distinct()
    }
  }

  /** Candidate pairs (a < b) sharing at least one LSH band.
    * `starAbove` caps per-bucket pair emission (see
    * [[pairsFromBands]]) — the knob that keeps duplicate-heavy
    * corpora subquadratic. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, numHashes: Int = 8,
                        rowsPerBand: Int = 2,
                        starAbove: Int = Int.MaxValue): DataFrame =
    pairsFromBands(bandsOf(df, idCol, textCol, shingleN, numHashes,
      rowsPerBand), idCol, starAbove)

  /** Exact token-set Jaccard for a set of candidate pairs — the verify
    * stage after LSH candidate generation. */
  def jaccard(df: DataFrame, idCol: String, textCol: String,
              pairs: DataFrame): DataFrame = {
    val toks = df.select(col(idCol).as("jid"),
      array_distinct(TextOps.tokens(col(textCol))).as("toks"))
    pairs
      .join(toks.withColumnRenamed("jid", "a_id").withColumnRenamed("toks", "ta"),
        col("a") === col("a_id"))
      .join(toks.withColumnRenamed("jid", "b_id").withColumnRenamed("toks", "tb"),
        col("b") === col("b_id"))
      .select(col("a"), col("b"),
        round(size(array_intersect(col("ta"), col("tb"))).cast("double") /
          size(array_union(col("ta"), col("tb"))), 4).as("jaccard"))
  }

  /** Persist a corpus's LSH bands as a lake table — the signature
    * INDEX that makes near-dedup incremental: computed once per doc
    * ever (append-only, O(new docs) per call via the store's
    * carry-by-reference manifests), instead of re-deriving the whole
    * corpus's signatures on every arrival. */
  def indexBands(store: graft.lake.TableStore, table: String, docs: DataFrame,
                 idCol: String, textCol: String, shingleN: Int = 3,
                 numHashes: Int = 8, rowsPerBand: Int = 2): Unit =
    appendBands(store, table,
      bandsOf(docs, idCol, textCol, shingleN, numHashes, rowsPerBand))

  /** Append a prebuilt band frame to the index table (create on first
    * use) — for callers that already hold the bands. */
  def appendBands(store: graft.lake.TableStore, table: String,
                  bands: DataFrame): Unit =
    if (store.exists(table)) store.append(table, bands)
    else store.create(table, bands)

  /** Near-dup candidates of a NEW batch against the persisted band
    * index: only the batch's signatures are computed; the corpus side
    * is a scan of the index table — the O(batch) arrival path a
    * 100 TB corpus needs. Returns (a = indexed id, b = batch id)
    * pairs sharing at least one band; verify with [[jaccard]]. */
  def batchCandidates(store: graft.lake.TableStore, table: String,
                      batch: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, numHashes: Int = 8,
                      rowsPerBand: Int = 2): DataFrame =
    indexCandidates(store, table,
      bandsOf(batch, idCol, textCol, shingleN, numHashes, rowsPerBand), idCol)

  /** [[batchCandidates]] for callers that already hold the batch's
    * band frame (one signature pass shared across intra pairs, index
    * pairs, and the index append). */
  def indexCandidates(store: graft.lake.TableStore, table: String,
                      newBands: DataFrame, idCol: String): DataFrame =
    store.read(table)
      .select(col(idCol).as("a"), col("band"), col("band_key"))
      .join(newBands.select(col(idCol).as("b"), col("band").as("band_r"),
          col("band_key").as("band_key_r")),
        col("band") === col("band_r") &&
          col("band_key") === col("band_key_r") && col("a") =!= col("b"))
      .select("a", "b").distinct()

  /** Connected components over an undirected edge list — the cluster
    * step that turns near-dup PAIRS into dedup GROUPS (keep one doc
    * per component). Iterated min-label propagation: every round each
    * node adopts the minimum label among itself and its neighbors;
    * at fixpoint each node's label is the smallest node id in its
    * component.
    *
    * Scale: each round is one hash-partitioned equi-join + groupBy
    * over (id, label) pairs — no single-reducer stage, no driver-side
    * graph. Labels are localCheckpointed per round (iterative lineage
    * would otherwise re-derive every prior round per reference);
    * convergence is a driver-side emptiness probe (A2-style).
    * Rounds needed = the largest component's diameter — near-dup
    * clusters (mirror families, boilerplate) are shallow; for
    * adversarially long path graphs use a star-contraction variant.
    * Converges-or-throws within `maxIters` rather than returning
    * half-propagated labels.
    *
    * Returns (id, component) for every node incident to an edge. */
  /** Driver-fold bound for [[connectedComponents]]: edge lists at or
    * under this size union-find on the driver (one materialize + one
    * cheap collect instead of O(diameter) join+aggregate rounds of
    * 2 jobs each). Near-dup edge sets are tiny relative to the corpus
    * by construction (they are the verified duplicate pairs); larger
    * graphs keep the distributed loop. */
  private val CcDriverMax =
    sys.env.get("SPARK_GRAFT_CC_DRIVER_MAX").map(_.toInt).getOrElse(500000)

  /** Spark sort order for the id types the driver fold supports (min
    * label = min reachable id must match the distributed aggregate). */
  private def ccOrderingOf(dt: org.apache.spark.sql.types.DataType)
      : Option[Ordering[Any]] = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType => Some(Ordering.by((x: Any) => x.asInstanceOf[Long]))
      case IntegerType => Some(Ordering.by((x: Any) => x.asInstanceOf[Int]))
      case StringType => Some(new Ordering[Any] {
        def compare(a: Any, b: Any): Int = {
          val x = a.asInstanceOf[String].getBytes("UTF-8")
          val y = b.asInstanceOf[String].getBytes("UTF-8")
          var i = 0
          while (i < x.length && i < y.length) {
            val c = (x(i) & 0xff) - (y(i) & 0xff)
            if (c != 0) return c
            i += 1
          }
          x.length - y.length
        }
      })
      case _ => None
    }
  }

  def connectedComponents(edges: DataFrame, aCol: String = "a",
                          bCol: String = "b", maxIters: Int = 20): DataFrame = {
    // checkpoint the adjacency ONCE: edges often arrive as the output
    // of an expensive pipeline (LSH candidates + verify), and every
    // propagation round joins against them — without the checkpoint
    // each round would recompute the whole edge derivation (measured
    // 4-5x the query cost). The checkpointed frame is two ids per edge.
    val prj = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
    val idType = prj.schema(0).dataType
    // Driver fold (round-15, guide §1/§2.4): min-label propagation ran
    // a join+aggregate+checkpoint round PER HOP plus a change probe —
    // ~2 jobs × O(diameter) rounds over an edge list that is KBs for
    // near-dup graphs. A bounded edge list instead checkpoints once,
    // collects from the local blocks, and union-finds on the driver —
    // the SAME fixpoint by construction (each node's component is the
    // minimum id it can reach). Unsupported id types, mismatched
    // endpoint types, nulls, or a list over the bound keep the
    // distributed loop, reusing the same checkpoint.
    val eCk = prj.localCheckpoint()
    val driverDone: Option[DataFrame] =
      if (idType != prj.schema(1).dataType) None
      else ccOrderingOf(idType).flatMap { ord =>
        val collected = graft.lake.JobLabel(edges.sparkSession, "graft:cc collect") {
          eCk.limit(CcDriverMax + 1).collect()
        }
        if (collected.length > CcDriverMax ||
            collected.exists(r => r.isNullAt(0) || r.isNullAt(1))) None
        else {
          val parent = new java.util.HashMap[Any, Any]()
          def find(x0: Any): Any = {
            var x = x0
            var p = parent.getOrDefault(x, x)
            while (p != x) { // path halving
              val gp = parent.getOrDefault(p, p)
              parent.put(x, gp)
              x = gp
              p = parent.getOrDefault(x, x)
            }
            x
          }
          collected.foreach { r =>
            val (ra, rb) = (find(r.get(0)), find(r.get(1)))
            if (ra != rb) parent.put(ra, rb)
          }
          // component label = min id per set (the distributed loop's
          // fixpoint), for every node incident to an edge
          val minOf = new java.util.HashMap[Any, Any]()
          val nodes = new java.util.LinkedHashSet[Any]()
          collected.foreach { r => nodes.add(r.get(0)); nodes.add(r.get(1)) }
          nodes.forEach { n =>
            val root = find(n)
            val cur = minOf.get(root)
            if (cur == null || ord.lt(n, cur)) minOf.put(root, n)
          }
          val out = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row](nodes.size)
          nodes.forEach { n =>
            out += org.apache.spark.sql.Row(n, minOf.get(find(n)))
          }
          import scala.jdk.CollectionConverters._
          import org.apache.spark.sql.types._
          Some(edges.sparkSession.createDataFrame(out.asJava, StructType(Seq(
            StructField("id", idType),
            StructField("component", idType)))))
        }
      }
    driverDone.foreach(df => return df)
    val und = eCk
      .union(eCk.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = und.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("component"))
      .localCheckpoint()
    var iter = 0
    while (iter < maxIters) {
      iter += 1
      val msgs = und.join(labels, col("src") === col("id"))
        .select(col("dst").as("id"), col("component"))
      val next = labels.union(msgs).groupBy("id")
        .agg(min("component").as("component"))
        .localCheckpoint()
      val changed = !next
        .join(labels.withColumnRenamed("component", "old"), Seq("id"))
        .where(col("component") =!= col("old"))
        .isEmpty
      labels = next
      if (!changed) return labels
    }
    throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIters rounds — " +
        "component diameter exceeds the bound; raise maxIters")
  }

  /** Connected components by alternating large-star / small-star
    * contraction (the Kiveris et al. "Connected Components in
    * MapReduce and Beyond" algorithm): converges in O(log n) rounds
    * regardless of component DIAMETER, where [[connectedComponents]]
    * needs O(diameter) rounds — use this for deep graphs (revision
    * chains, link paths); min-label stays cheaper for the shallow
    * star-shaped clusters near-dup edges produce.
    *
    * Each round: large-star hangs every neighbor larger than u onto
    * the minimum of u's neighborhood; small-star re-points the
    * smaller neighbors. Both are one groupBy + one equi-join over the
    * edge list — no single-reducer stage; per-round localCheckpoint
    * cuts the iterative lineage. Converged when the edge set is a
    * fixpoint (stars rooted at each component's minimum).
    *
    * Returns (id, component) for every node incident to an edge. */
  def connectedComponentsStar(edges: DataFrame, aCol: String = "a",
                              bCol: String = "b",
                              maxIters: Int = 32): DataFrame = {
    def und(e: DataFrame): DataFrame =
      e.union(e.select(col("v").as("u"), col("u").as("v")))

    // large-star: for every neighbor v > u, emit (v, min(Γ(u) ∪ {u}))
    def largeStar(e: DataFrame): DataFrame = {
      val g = und(e)
      val mins = g.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      g.where(col("v") > col("u"))
        .join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
    }

    // small-star: group each edge at its larger endpoint; re-point
    // that endpoint and its smaller neighbors at their minimum
    def smallStar(e: DataFrame): DataFrame = {
      val le = und(e).where(col("v") < col("u"))
      val mins = le.groupBy("u").agg(min("v").as("m"))
      val repointed = le.join(mins, "u")
        .where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
      repointed.union(mins.select(col("u"), col("m").as("v")))
        .distinct()
    }

    // node set from the RAW edges: nodes whose only edges are
    // self-loops must still be labeled (with themselves), matching
    // the min-label variant's contract
    val nodes = edges.select(col(aCol).as("id"))
      .union(edges.select(col(bCol).as("id")))
      .distinct()
      .localCheckpoint()
    var cur = edges
      .select(col(aCol).as("u"), col(bCol).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    var iter = 0
    while (iter < maxIters) {
      iter += 1
      val next = smallStar(largeStar(cur)).localCheckpoint()
      val stable = next.count() == cur.count() &&
        next.except(cur).isEmpty
      cur = next
      if (stable) {
        val stars = cur.select(col("u").as("id"), col("v").as("lbl"))
        return nodes.join(stars, Seq("id"), "left")
          .select(col("id"), coalesce(col("lbl"), col("id")).as("component"))
      }
    }
    throw new IllegalStateException(
      s"connectedComponentsStar did not converge in $maxIters rounds")
  }

  /** SimHash (32-bit) from token hashes: per-bit majority vote over a
    * 32-bit token hash. Near-dups = small Hamming distance. The token
    * hash is the first 8 hex chars of md5 parsed as an integer — same
    * md5-as-random-bits trick as the minhash permutation, so the whole
    * signature computes identically in any engine with md5 and is
    * oracle-checkable (vs the engine-specific xxhash64 it replaces). */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokHash = df.select(col(idCol),
      explode(array_distinct(TextOps.tokens(col(textCol)))).as("tok"))
      .select(col(idCol),
        conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long").as("th"))
    // per bit: sum(+1 if set else -1) as 32 codegen'd conditional
    // aggregates over ONE exploded-token pass (no 32x row blowup);
    // partial sums combine map-side, shuffle carries 32 longs per doc
    val votes = (0 until 32).map { b =>
      sum(when(shiftright(col("th"), b).bitwiseAND(1) === 1, 1L)
        .otherwise(-1L)).as(s"v_$b")
    }
    tokHash.groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      // 2^b exact in double for b < 32; total < 2^32 exact
      .select(col(idCol),
        (0 until 32).map(b =>
          when(col(s"v_$b") > 0, math.pow(2.0, b)).otherwise(0.0))
          .reduce(_ + _).cast("long").as("simhash"))
  }
}
