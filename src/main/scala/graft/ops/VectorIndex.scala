package graft.ops

import graft.lake.TableStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted IVF (inverted-file) ANN index over an embedding corpus,
  * stored IN the table store — train once, serve many. The per-query
  * [[Similarity.ivfTopK]] re-trains and re-assigns the corpus on every
  * call; at 100 TB the index build is the expensive pass and queries
  * must not repeat it. Build writes two tables:
  *
  *   - `<name>_centroids` — the (cent_id, cvec) k-means result, tiny
  *     (nlist × dim), broadcast at search time;
  *   - `<name>_lists` — the inverted lists (cent_id, id, vec),
  *     hive-PARTITIONED by cent_id.
  *
  * Search assigns each probe its `nprobe` closest centroids (broadcast
  * — no corpus touch), then reads ONLY those lists: the probed
  * cent_ids land as a LITERAL IN on the lists table's partition
  * column, so partition pruning drops every unprobed list directory
  * before a file opens — the store's scan-avoidance lever applied to
  * ANN. The probed-id set is ≤ nlist by construction, so the
  * driver-side collect is bounded metadata, never data-sized.
  *
  * Determinism mirrors [[Similarity.ivfSearch]] (4-dp rounded cosines,
  * cent_id/vid tiebreaks), so a search against a freshly built index
  * equals `ivfSearch` given the same centroids — the parity a DuckDB
  * oracle holding the centroid literals re-proves per run. Rebuild
  * overwrites both tables atomically (each commit is atomic; a reader
  * racing a rebuild sees old or new lists, never a mix of list
  * versions within one table).
  */
object VectorIndex {

  def centroidsTable(name: String): String = s"${name}_centroids"
  def listsTable(name: String): String = s"${name}_lists"
  def booksTable(name: String): String = s"${name}_books"
  def codesTable(name: String): String = s"${name}_codes"

  /** An index table's column set, cached per (store root, table): it
    * is fixed at build time (appends conform to it), and the
    * streaming ingest needs it EVERY micro-batch — deriving it by
    * building a full read plan per batch would put an O(manifest)
    * metadata walk back on the hot path the store's checkpoint hint
    * keeps O(1). A rebuild through this object refreshes the entry;
    * an out-of-band schema change (another process rebuilding with
    * different attrCols) is picked up on the next JVM, the same
    * staleness window any schema cache has. */
  private val colsCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Seq[String]]()

  private[graft] def cachedCols(store: TableStore, table: String): Seq[String] =
    colsCache.computeIfAbsent((store.rootPath, table),
      _ => store.read(table).columns.toSeq)

  private[graft] def listCols(store: TableStore, name: String): Seq[String] =
    cachedCols(store, listsTable(name))

  /** Train k-means over `corpus` and persist centroids + inverted
    * lists under `name`. O(corpus) — one assignment pass after
    * training; re-running overwrites (index rebuild). `attrCols` are
    * carried INTO the inverted lists (lang, date, source, …) so
    * [[searchIvfIndexFiltered]] can push an attribute predicate into
    * the lists scan — the store's stats/bloom sidecars then prune
    * list FILES by the attribute on top of the cent_id partition
    * pruning, instead of post-filtering shrunken results. */
  def buildIvfIndex(store: TableStore, name: String, corpus: DataFrame,
                    nlist: Int = 16, kmeansIters: Int = 2,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    attrCols: Seq[String] = Nil): Unit = {
    // ONE corpus materialization feeds training AND assignment: the
    // k-means passes and the list-assignment pass all read executor-
    // local checkpoint blocks instead of re-decoding parquet per
    // consumer (guide §2.4 — the passes share the projection, so the
    // exchange-equivalent work happens once). Same at-scale story as
    // kmeansCentroids' own checkpoint: the caller samples at 100 TB.
    val proj = graft.lake.JobLabel(corpus.sparkSession, "graft:ivf build checkpoint") {
      corpus.select((Seq(idCol, vecCol) ++ attrCols).map(col): _*)
        .localCheckpoint()
    }
    val cents = Similarity.kmeansCentroidsOn(proj, nlist, kmeansIters,
      idCol, vecCol)
    val lists = Similarity.assignClusters(proj, cents, idCol, vecCol,
        carryCols = attrCols)
      .select((Seq("cent_id", idCol, vecCol) ++ attrCols).map(col): _*)
    val ct = centroidsTable(name)
    val lt = listsTable(name)
    if (store.exists(ct)) store.overwrite(ct, cents)
    else store.create(ct, cents)
    // default layout handling on every path: the commit AQE-rebalances
    // partitioned writes on cent_id, so list files stay few and
    // right-sized instead of tasks × nlist fragments (preserveLayout
    // would skip that — it is for pre-shaped z-ordered frames, which
    // this assignment output is not)
    if (store.exists(lt)) store.overwrite(lt, lists)
    else store.create(lt, lists, partitionBy = Seq("cent_id"))
    colsCache.put((store.rootPath, lt),
      Seq("cent_id", idCol, vecCol) ++ attrCols)
  }

  /** Persist an IVF-PQ index (the IVFADC design of Jégou/Douze/Schmid,
    * "Product Quantization for Nearest Neighbor Search", TPAMI 2011 —
    * the shape FAISS serves billion-vector corpora with): a coarse
    * quantizer routes vectors into inverted lists, and the lists store
    * m-byte PQ CODES instead of full vectors, so the stored index is
    * ~dim·4/m× smaller than the corpus and a probed search reads only
    * code bytes. Three tables:
    *
    *   - `<name>_centroids` — coarse k-means (cent_id, cvec), tiny;
    *   - `<name>_books`     — per-subspace codebooks (sub, cent_id,
    *     cvec), m × ksub rows, tiny — broadcast at search time;
    *   - `<name>_codes`     — (cent_id, id, sub, code): m small-int
    *     rows per vector, hive-PARTITIONED by cent_id (probed lists
    *     prune at the partition level exactly like the full-vector
    *     index; the narrow int columns RLE/dict-compress to the PQ
    *     budget in parquet).
    *
    * Training (coarse + codebooks) is deterministic (lowest-id seeds,
    * fixed iterations, rounded-cosine argmax with cent_id tiebreaks),
    * so both literal sets embed into a DuckDB oracle replay. */
  def buildIvfPqIndex(store: TableStore, name: String, corpus: DataFrame,
                      nlist: Int = 16, m: Int = 8, ksub: Int = 16,
                      kmeansIters: Int = 2,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding",
                      attrCols: Seq[String] = Nil): Unit = {
    // ONE corpus materialization feeds coarse training, PQ training,
    // assignment and encode (see buildIvfIndex)
    val proj = graft.lake.JobLabel(corpus.sparkSession, "graft:ivfpq build checkpoint") {
      corpus.select((Seq(idCol, vecCol) ++ attrCols).map(col): _*)
        .localCheckpoint()
    }
    val cents = Similarity.kmeansCentroidsOn(proj, nlist, kmeansIters,
      idCol, vecCol)
    val books = Similarity.pqTrain(proj, m, ksub, kmeansIters,
      idCol, vecCol)
    // assignment first, then the encode CARRIES cent_id + attrCols
    // through its per-(id, sub) argmax (constant per id) — the old
    // id-join that re-attached them shuffled the whole code frame;
    // now the codes pipeline is assign → explode → encode → write
    // with no join (guide §2.4). attrCols ride as before (narrow
    // values that RLE/dict-compress away in parquet) so
    // [[searchIvfPqIndexFiltered]] can push predicates into the scan.
    val assigned = Similarity.assignClusters(proj, cents, idCol, vecCol,
        carryCols = attrCols)
    val codes = Similarity.pqEncode(assigned, books, m, idCol, vecCol,
        carryCols = "cent_id" +: attrCols)
      .select((Seq("cent_id", idCol, "sub", "code") ++ attrCols).map(col): _*)
    def put(t: String, df: DataFrame, parts: Seq[String] = Nil): Unit =
      if (store.exists(t)) store.overwrite(t, df)
      else store.create(t, df, partitionBy = parts)
    put(centroidsTable(name), cents)
    put(booksTable(name), books)
    put(codesTable(name), codes, Seq("cent_id"))
    colsCache.put((store.rootPath, codesTable(name)),
      Seq("cent_id", idCol, "sub", "code") ++ attrCols)
  }

  /** IVF-PQ search: probes assign to their nprobe coarse lists
    * (broadcast centroids), ONLY those code partitions are read
    * (literal-IN pruning on cent_id), and candidates score by
    * asymmetric distance — each probe's m × ksub dot-product LUT
    * broadcasts into the code join, a candidate's approximate cosine
    * is Σ LUT[sub][code] over its m codes normalized by probe and
    * reconstruction norms. Nothing data-sized moves: per probed list
    * the work is |list| × m small-int rows, and the corpus/full
    * vectors are never touched. Determinism matches pqTopK (4-dp
    * rounding, vid tiebreak) so the oracle replays ranking exactly.
    * Result: (qid, vid, cos_pq, rnk ≤ k). */
  def searchIvfPqIndex(store: TableStore, name: String, probes: DataFrame,
                       k: Int, nprobe: Int, m: Int = 0,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame =
    searchIvfPqCore(store, name, probes, k, nprobe, None, m, idCol, vecCol)

  /** Attribute-filtered IVF-PQ search — [[searchIvfIndexFiltered]]'s
    * contract on the code-compressed index: the predicate pushes into
    * the codes scan (a filtered-out vector loses all m of its code
    * rows, so survivors' reconstruction norms are untouched), ranking
    * runs over the survivors, and the probe set widens by the same
    * measured-selectivity rule. Selectivity measured over code rows
    * equals the vector-level ratio exactly (every vector contributes
    * exactly m rows, and IEEE division of equal true quotients yields
    * identical doubles — the oracle replays from the corpus side). */
  def searchIvfPqIndexFiltered(store: TableStore, name: String,
                               probes: DataFrame, k: Int, nprobe: Int,
                               filter: org.apache.spark.sql.Column,
                               selectivity: Double = Double.NaN,
                               m: Int = 0,
                               idCol: String = "vec_id",
                               vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.functions.{count => cnt}
    val codes0 = store.read(codesTable(name))
    val s0 =
      if (!selectivity.isNaN) selectivity
      else {
        val r = codes0.agg(cnt(lit(1)), cnt(when(filter, 1))).first()
        if (r.getLong(0) == 0L) 1.0
        else r.getLong(1) * 1.0 / r.getLong(0)
      }
    val nlist = store.read(centroidsTable(name)).count()
    val widened = math.min(nlist.toDouble,
      math.ceil(nprobe / math.max(s0, 1e-9))).toInt
    searchIvfPqCore(store, name, probes, k, math.max(nprobe, widened),
      Some(filter), m, idCol, vecCol)
  }

  private def searchIvfPqCore(store: TableStore, name: String,
                              probes: DataFrame, k: Int, nprobe: Int,
                              codesFilter: Option[org.apache.spark.sql.Column],
                              m: Int, idCol: String,
                              vecCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(probes.sparkSession)
    val cents = store.read(centroidsTable(name))
    val books = store.read(booksTable(name))
    val (mUse, sd) = bookMeta(books, m)
    val pa = Similarity.assignTopClusters(probes, cents, nprobe,
        idCol, vecCol)
      .select(col(idCol).as("qid"), col("cent_id"))
    val codes00 = store.read(codesTable(name))
    val codes0 = codesFilter.fold(codes00)(codes00.where)
    val dt = codes0.schema("cent_id").dataType
    val needed = graft.lake.JobLabel(probes.sparkSession, "graft:ivfpq probe assign") {
      pa.select(col("cent_id").cast(dt)).distinct()
        .collect().map(_.get(0)).toIndexedSeq
    }
    if (needed.isEmpty)
      return pa.select(col("qid"), col("qid").as("vid"),
        lit(0.0).as("cos_pq"), lit(0).as("rnk")).where(lit(false))
    val lists = codes0.where(col("cent_id").isin(needed: _*))
      .select(col("cent_id"), col(idCol).as("vid"), col("sub"), col("code"))
    // per-probe LUT: dot of each probe sub-vector with every codeword
    val lut = Similarity.subVectors(probes, mUse, sd, idCol, vecCol, "qid")
      .join(broadcast(books), Seq("sub"))
      .select(col("qid"), col("sub"), col("cent_id").as("code"),
        Similarity.dot(col("svec"), col("cvec")).as("pd"))
    // reconstruction norm from the PRUNED codes only — per-vid
    // intrinsic, so pruning cannot change a surviving candidate's score
    val bookNorms = books.select(col("sub"), col("cent_id").as("code"),
      Similarity.dot(col("cvec"), col("cvec")).as("css"))
    val reconNorm = lists.join(broadcast(bookNorms), Seq("sub", "code"))
      .groupBy("vid").agg(sqrt(sum("css")).as("rn"))
    val qNorm = probes.select(col(idCol).as("qid"),
      Similarity.norm(col(vecCol)).as("qn"))
    // candidate pairs come straight off the list join: a vid lives in
    // exactly one list, so (qid, vid) appears once per sub — the
    // group-by sums exactly its m LUT entries, no distinct needed
    val scored = lists
      .join(pa.withColumn("cent_id", col("cent_id").cast(dt)), Seq("cent_id"))
      .where(col("qid") =!= col("vid"))
      .join(broadcast(lut), Seq("qid", "sub", "code"))
      .groupBy("qid", "vid").agg(sum("pd").as("adp"))
      .join(reconNorm, Seq("vid"))
      .join(broadcast(qNorm), Seq("qid"))
      .select(col("qid"), col("vid"),
        round(col("adp") / (col("qn") * col("rn")), 4).as("cos_pq"))
    val w = Window.partitionBy("qid").orderBy(col("cos_pq").desc, col("vid"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }

  /** Assign + encode a batch against an IVF-PQ index's STORED
    * quantizers — the shared O(batch · m) maintenance frame
    * ((cent_id, id, sub, code)) behind both the batch append and the
    * streaming micro-batch ingest. */
  def encodeForIvfPq(store: TableStore, name: String, batch: DataFrame,
                     m: Int = 0, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val cents = store.read(centroidsTable(name))
    val books = store.read(booksTable(name))
    // conform to the codes table's column set (cached — the streaming
    // ingest calls this per micro-batch): attribute columns the index
    // was built with must come from the batch, loudly, not null-fill
    val cols = cachedCols(store, codesTable(name))
    val attrs = cols.filterNot(Set("cent_id", idCol, "sub", "code"))
    // assign, then carry cent_id + attrs through the encode's
    // per-(id, sub) argmax — no id-join (see buildIvfPqIndex)
    val assigned = Similarity.assignClusters(batch, cents, idCol, vecCol,
        carryCols = attrs)
    Similarity.pqEncode(assigned, books, bookMeta(books, m)._1, idCol,
        vecCol, carryCols = "cent_id" +: attrs)
      .select(cols.map(col): _*)
  }

  /** (m, sub-dim) of a stored codebook table, in ONE driver action
    * over the tiny books frame. m is what the index was BUILT with
    * (max sub + 1); a caller-supplied m is validated against it — a
    * mismatched m would slice probes into wrong-width sub-vectors and
    * return plausible-looking but wrong rankings; 0 (the default on
    * every read path) means "use the stored value". */
  private def bookMeta(books: DataFrame, m: Int): (Int, Int) = {
    val r = graft.lake.JobLabel(books.sparkSession, "graft:pq book meta") {
      books.agg(max(col("sub")), first(size(col("cvec")))).first()
    }
    val stored = r.getInt(0) + 1
    require(m <= 0 || m == stored,
      s"m=$m does not match the stored codebooks (index was built with m=$stored)")
    (stored, r.getInt(1))
  }

  /** Incremental IVF-PQ maintenance: assign + encode `batch` against
    * the STORED coarse centroids and codebooks and append its code
    * rows — O(batch · m), no retraining, no corpus re-read, same
    * append-≡-rebuild contract as [[appendToIvfIndex]]. */
  def appendToIvfPqIndex(store: TableStore, name: String, batch: DataFrame,
                         m: Int = 0,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): Unit =
    store.append(codesTable(name),
      encodeForIvfPq(store, name, batch, m, idCol, vecCol))

  /** Incremental index maintenance: assign `batch` to the EXISTING
    * trained centroids and append to the inverted lists — O(batch);
    * no rebuild, no corpus re-read, and the append lands under the
    * lists table's hive layout so partition pruning keeps holding.
    * The assignment rule is the same expression `buildIvfIndex` uses,
    * so build(a) + append(b) serves exactly what build over a ∪ b
    * with the same centroids would (the ivf_ann_incremental oracle
    * re-proves that contract per run). Centroids do drift as data
    * arrives: a batch far from the training distribution piles into
    * few lists — watch `describeIvfIndex` skew and rebuild when
    * max(rows) outgrows the mean by your probe budget. */
  def appendToIvfIndex(store: TableStore, name: String, batch: DataFrame,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): Unit = {
    val cents = store.read(centroidsTable(name))
    // carry whatever attribute columns the lists were BUILT with —
    // the batch must supply them, or the append fails loudly instead
    // of silently nulling the filterable attributes of new vectors
    val cols = listCols(store, name)
    val assigned = Similarity.assignClusters(batch, cents, idCol, vecCol,
        carryCols = cols.filterNot(Set("cent_id", idCol, vecCol)))
      .select(cols.map(col): _*)
    store.append(listsTable(name), assigned)
  }

  /** Build an IVF index over a STORE TABLE and bind it to that
    * table's version history: the lists table's creation commit
    * records the corpus version it indexed as an application-
    * transaction watermark, so [[syncIvfIndex]] can later pull the
    * corpus's change feed from exactly that point. The read is
    * version-pinned — a commit racing the build lands in the first
    * sync, never in a gap. */
  def buildIvfIndexFromTable(store: TableStore, name: String,
                             corpusTable: String,
                             nlist: Int = 16, kmeansIters: Int = 2,
                             idCol: String = "vec_id",
                             vecCol: String = "embedding",
                             attrCols: Seq[String] = Nil): Unit = {
    val v = store.currentVersion(corpusTable).getOrElse(
      throw new IllegalStateException(s"table $corpusTable does not exist"))
    val corpus = store.readVersion(corpusTable, v)
    // one corpus materialization for training + assignment (see
    // buildIvfIndex); also pins the version-v rows against the store
    val proj = graft.lake.JobLabel(corpus.sparkSession, "graft:ivf build checkpoint") {
      corpus.select((Seq(idCol, vecCol) ++ attrCols).map(col): _*)
        .localCheckpoint()
    }
    val cents = Similarity.kmeansCentroidsOn(proj, nlist, kmeansIters,
      idCol, vecCol)
    val lists = Similarity.assignClusters(proj, cents, idCol, vecCol,
        carryCols = attrCols)
      .select((Seq("cent_id", idCol, vecCol) ++ attrCols).map(col): _*)
    val ct = centroidsTable(name)
    val lt = listsTable(name)
    if (store.exists(ct)) store.overwrite(ct, cents)
    else store.create(ct, cents)
    if (store.exists(lt))
      store.overwriteTxn(lt, lists, syncApp(corpusTable), v)
    else store.createTxn(lt, lists, syncApp(corpusTable), v,
      partitionBy = Seq("cent_id"))
    colsCache.put((store.rootPath, lt),
      Seq("cent_id", idCol, vecCol) ++ attrCols)
  }

  private def syncApp(corpusTable: String) = s"ivf-sync-$corpusTable"

  /** [[buildIvfIndexFromTable]] for the IVF-PQ shape: the codes
    * table's creation commit carries the indexed corpus version, so
    * [[syncIvfPqIndex]] can follow the table's change feed. */
  def buildIvfPqIndexFromTable(store: TableStore, name: String,
                               corpusTable: String,
                               nlist: Int = 16, m: Int = 8, ksub: Int = 16,
                               kmeansIters: Int = 2,
                               idCol: String = "vec_id",
                               vecCol: String = "embedding",
                               attrCols: Seq[String] = Nil): Unit = {
    val v = store.currentVersion(corpusTable).getOrElse(
      throw new IllegalStateException(s"table $corpusTable does not exist"))
    val corpus = store.readVersion(corpusTable, v)
    // one corpus materialization + join-free carry-through encode
    // (see buildIvfPqIndex)
    val proj = graft.lake.JobLabel(corpus.sparkSession, "graft:ivfpq build checkpoint") {
      corpus.select((Seq(idCol, vecCol) ++ attrCols).map(col): _*)
        .localCheckpoint()
    }
    val cents = Similarity.kmeansCentroidsOn(proj, nlist, kmeansIters,
      idCol, vecCol)
    val books = Similarity.pqTrain(proj, m, ksub, kmeansIters,
      idCol, vecCol)
    val assigned = Similarity.assignClusters(proj, cents, idCol, vecCol,
        carryCols = attrCols)
    val codes = Similarity.pqEncode(assigned, books, m, idCol, vecCol,
        carryCols = "cent_id" +: attrCols)
      .select((Seq("cent_id", idCol, "sub", "code") ++ attrCols).map(col): _*)
    def put(t: String, df: DataFrame): Unit =
      if (store.exists(t)) store.overwrite(t, df) else store.create(t, df)
    put(centroidsTable(name), cents)
    put(booksTable(name), books)
    val kt = codesTable(name)
    if (store.exists(kt))
      store.overwriteTxn(kt, codes, syncApp(corpusTable), v)
    else store.createTxn(kt, codes, syncApp(corpusTable), v,
      partitionBy = Seq("cent_id"))
    colsCache.put((store.rootPath, kt),
      Seq("cent_id", idCol, "sub", "code") ++ attrCols)
  }

  /** [[syncIvfIndex]] on the code-compressed index: the same netted
    * change-feed application — touched ids' code rows equality-delete
    * (one key removes all m), final states assign + PQ-encode against
    * the STORED quantizers and insert, the corpus version rides the
    * commit — one atomic O(changed · m) merge-on-read commit,
    * idempotent under redelivery. */
  def syncIvfPqIndex(store: TableStore, name: String, corpusTable: String,
                     m: Int = 0, idCol: String = "vec_id",
                     vecCol: String = "embedding"): Option[Long] = {
    val kt = codesTable(name)
    val app = syncApp(corpusTable)
    val last = store.lastTxn(kt, app).getOrElse(throw new IllegalStateException(
      s"index $name is not bound to $corpusTable — build it with " +
        "buildIvfPqIndexFromTable to record the sync watermark"))
    store.changesSince(corpusTable, last) match {
      case None => None
      case Some((feed, cur)) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(idCol).orderBy(
          col("_commit_version").desc,
          when(col("_change_type") === "insert", 0).otherwise(1))
        val latest = feed.withColumn("__r", row_number().over(w))
          .where(col("__r") === 1)
        val inserts = latest.where(col("_change_type") === "insert")
          .drop("_change_type", "_commit_version", "__r")
        val touched = feed.select(col(idCol)).distinct()
        store.appendWithDeletes(kt,
          encodeForIvfPq(store, name, inserts, m, idCol, vecCol),
          touched, txn = Some((app, cur)))
        Some(cur)
    }
  }

  /** Catch the index up with its corpus table's CHANGE FEED — the
    * "index follows the table" maintenance move. One call applies
    * everything committed since the last sync (or the
    * [[buildIvfIndexFromTable]] bootstrap) as ONE atomic merge-on-read
    * commit: every touched id's old list rows equality-delete, the
    * ids' current rows (keep-latest netted from the feed — a key
    * deleted and reinserted in the range lands once, a key whose last
    * change is a delete lands zero times) re-assign and insert, and
    * the corpus version rides the commit as the sync watermark —
    * crash-redelivery no-ops (same SetTransaction discipline as the
    * streaming ingest). O(changed data): the feed is manifest-aware
    * on append-only history and the commit rewrites no list file.
    * Returns the corpus version synced to, or None when already
    * current. */
  def syncIvfIndex(store: TableStore, name: String, corpusTable: String,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): Option[Long] = {
    val lt = listsTable(name)
    val app = syncApp(corpusTable)
    val last = store.lastTxn(lt, app).getOrElse(throw new IllegalStateException(
      s"index $name is not bound to $corpusTable — build it with " +
        "buildIvfIndexFromTable to record the sync watermark"))
    store.changesSince(corpusTable, last) match {
      case None => None
      case Some((feed, cur)) =>
        import org.apache.spark.sql.expressions.Window
        // net the feed to each touched id's FINAL state: latest
        // commit wins; within one commit an insert beats the delete
        // that precedes it (a delete-and-reinsert batch)
        val w = Window.partitionBy(idCol).orderBy(
          col("_commit_version").desc,
          when(col("_change_type") === "insert", 0).otherwise(1))
        val latest = feed.withColumn("__r", row_number().over(w))
          .where(col("__r") === 1)
        val inserts = latest.where(col("_change_type") === "insert")
          .drop("_change_type", "_commit_version", "__r")
        val touched = feed.select(col(idCol)).distinct()
        val cents = store.read(centroidsTable(name))
        val cols = listCols(store, name)
        val assigned = Similarity.assignClusters(inserts, cents, idCol,
            vecCol,
            carryCols = cols.filterNot(Set("cent_id", idCol, vecCol)))
          .select(cols.map(col): _*)
        store.appendWithDeletes(lt, assigned, touched,
          txn = Some((app, cur)))
        Some(cur)
    }
  }

  /** Propagate corpus deletes into the persisted index: drop `ids`'
    * vectors from the inverted lists as merge-on-read EQUALITY
    * deletes — one O(batch) commit, no list rewrite (the store
    * anti-joins the keys at read; `OPTIMIZE`/compact folds the debt
    * away). Without this, a dedup purge or CDC delete on the corpus
    * leaves the index serving stale ids forever. The contract —
    * search-after-delete ≡ search over an index rebuilt from the
    * survivors (same centroids; deletes never retrain) — is what
    * the ivf_ann_after_delete oracle and VectorIndexSpec re-prove. */
  def deleteFromIvfIndex(store: TableStore, name: String, ids: DataFrame,
                         idCol: String = "vec_id"): Unit =
    deleteFromIndexTable(store, listsTable(name), ids, idCol)

  /** [[deleteFromIvfIndex]] for an IVF-PQ index: one equality-delete
    * key removes all m code rows of each vector. */
  def deleteFromIvfPqIndex(store: TableStore, name: String, ids: DataFrame,
                           idCol: String = "vec_id"): Unit =
    deleteFromIndexTable(store, codesTable(name), ids, idCol)

  private def deleteFromIndexTable(store: TableStore, table: String,
                                   ids: DataFrame, idCol: String): Unit = {
    require(store.exists(table), s"unknown vector index table $table")
    // delete-only commit: an empty batch under the lists schema plus
    // the equality-delete keys — the store publishes carried files +
    // del lines, O(keys), zero data rewritten
    store.appendWithDeletes(table,
      store.read(table).where(org.apache.spark.sql.functions.lit(false)),
      ids.select(col(idCol)).distinct())
  }

  /** Full reindex from the index's own contents: retrain k-means over
    * the current inverted lists (they ARE the corpus — the original
    * table is never re-read) and rebuild both tables. This is the
    * move `describeIvfIndex`'s skew signal calls for once appended
    * batches have drifted from the training distribution and piled
    * into few lists: one corpus-sized pass, two atomic overwrites.
    * Each TABLE's swing is atomic, but centroids and lists are
    * separate commits: a search racing the rebuild can pair the new
    * centroids with the old lists for one probe — an approximation-
    * quality wobble (probed partitions chosen under the other
    * quantizer), never a correctness break, and it heals at the lists
    * swing. Serve searches from a pinned `readVersion` or schedule
    * rebuilds off-peak when even that wobble matters. */
  def rebuildIvfIndex(store: TableStore, name: String, nlist: Int = 16,
                      kmeansIters: Int = 2, idCol: String = "vec_id",
                      vecCol: String = "embedding"): Unit = {
    val lt = listsTable(name)
    // an attribute-built index keeps its attributes across rebuilds —
    // they are derived from the stored lists schema, not re-declared
    // by the caller (dropping them would silently break filtered
    // search AND poison colsCache so later appends stop carrying them)
    val attrs = store.read(lt).columns.toSeq
      .filterNot(Set("cent_id", idCol, vecCol))
    // an index bound to a corpus table's change feed keeps its
    // binding: the rebuild re-commits the lists under the SAME app id
    // and watermark, so syncIvfIndex keeps pulling the feed from where
    // the last sync left it (a plain overwrite would strand the
    // watermark in an old manifest and unbind once it's vacuumed)
    val binding = store.lastTxnMatching(lt, "ivf-sync-")
    // pin the read before the overwrite swings the pointer; the
    // checkpoint MATERIALIZES the old version's rows, so the rebuild's
    // write depends on no store files at all (and training +
    // re-assignment share the one materialization — see buildIvfIndex)
    val corpus = graft.lake.JobLabel(store.spark, "graft:ivf rebuild checkpoint") {
      store.read(lt)
        .select((Seq(idCol, vecCol) ++ attrs).map(col): _*)
        .localCheckpoint()
    }
    val cents = Similarity.kmeansCentroidsOn(corpus, nlist, kmeansIters,
      idCol, vecCol)
    val lists = Similarity.assignClusters(corpus, cents, idCol, vecCol,
        carryCols = attrs)
      .select((Seq("cent_id", idCol, vecCol) ++ attrs).map(col): _*)
    val ct = centroidsTable(name)
    if (store.exists(ct)) store.overwrite(ct, cents)
    else store.create(ct, cents)
    binding match {
      // re-ASSERT (not advance) the watermark: the rebuild rewrites
      // content the syncs already applied, so the cursor must stay
      // where the last sync left it — overwriteTxn's replay guard
      // would see the equal version and no-op the whole rebuild
      case Some((app, v)) => store.overwriteReassertTxn(lt, lists, app, v)
      case None           => store.overwrite(lt, lists)
    }
    colsCache.put((store.rootPath, lt),
      Seq("cent_id", idCol, vecCol) ++ attrs)
  }

  /** Scan-free index profile: one row per inverted list with its live
    * file and row counts — (cent_id, files, rows) — served entirely
    * from the manifest + stats sidecar (parquet footer counts folded
    * at commit), so no list file is opened. This is the
    * rebuild-vs-append signal at 100 TB: rows_max / rows_avg far
    * above 1 means the centroids have drifted and probes over-read.
    * Counts are manifest-sized driver metadata (one entry per file),
    * never data-sized. */
  def describeIvfIndex(store: TableStore, name: String): DataFrame = {
    // works for both index shapes: full-vector lists (one row per
    // vector) and IVF-PQ codes (m rows per vector — the skew RATIO is
    // what matters, and a constant factor cancels out of it)
    val lt = if (store.exists(listsTable(name))) listsTable(name)
             else codesTable(name)
    require(store.exists(lt), s"unknown vector index $name")
    val CentDir = ".*/cent_id=([^/]+)/[^/]*$".r
    // one version pin for BOTH the file inventory and the row counts —
    // a commit racing the profile must not tear it across versions
    val v = store.currentVersion(lt).get
    val rowsByFile = store.fileRowCounts(lt, v)
    // file inventory comes from the MANIFEST, not from the sidecar: a
    // file without a folded footer count (pre-stats commit, CONVERTed
    // foreign file) still counts toward `files` and turns its list's
    // row total NULL = unknown — never silently smaller. cent_id stays
    // the raw partition-directory value (string), so non-numeric ids
    // profile instead of crashing; "" marks unpartitioned strays.
    val perFile = store.liveDataFiles(lt, v).map { f =>
      val cid = f match { case CentDir(c) => c; case _ => "" }
      (cid, rowsByFile.get(f))
    }
    val spark = store.spark
    import spark.implicits._
    perFile.toDF("cent_id", "rows")
      .groupBy("cent_id")
      .agg(count(lit(1)).as("files"),
        when(count(when(col("rows").isNull, 1)) > 0, lit(null))
          .otherwise(sum("rows")).as("rows"))
      // numeric ids order numerically; non-numeric ones sort after,
      // lexicographically (cast returns NULL for them)
      .orderBy(col("cent_id").cast("long").asc_nulls_last, col("cent_id"))
  }

  /** ANN top-k for `probes` against the persisted index — never
    * touches the corpus table, reads only the probed lists. Result
    * shape matches [[Similarity.ivfSearch]]: (qid, vid, cos, rnk),
    * rnk ≤ k per probe. */
  def searchIvfIndex(store: TableStore, name: String, probes: DataFrame,
                     k: Int, nprobe: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame =
    searchIvfCore(store, name, store.read(centroidsTable(name)), probes,
      k, nprobe, None, idCol, vecCol)

  /** Attribute-filtered ANN — "top-k WHERE lang='en' / date range",
    * the most common production ANN query. The predicate pushes INTO
    * the lists scan (partition pruning on the probed cent_ids still
    * applies first; the store's stats/bloom sidecars then skip list
    * files by the attribute), and ranking runs over the SURVIVORS —
    * k never silently shrinks to whatever a post-filter left.
    *
    * Probe widening: a selective filter thins every list, so reading
    * the base `nprobe` lists would surface fewer than k matches per
    * probe. Effective probes =
    * `max(nprobe, min(nlist, ceil(nprobe / selectivity)))` — the
    * widened read keeps E[survivors per probe set] at the unfiltered
    * level, capped at the whole index. Selectivity is measured with
    * one column-pruned aggregate over the lists table (only the
    * filter's attribute columns are read) unless the caller passes
    * it — at 100 TB supply it from table stats (`ANALYZE`) or a
    * sample instead of the measuring pass. The rule is replayed
    * verbatim (same counts, same IEEE arithmetic) by the
    * ivf_ann_filtered DuckDB oracle. */
  def searchIvfIndexFiltered(store: TableStore, name: String,
                             probes: DataFrame, k: Int, nprobe: Int,
                             filter: org.apache.spark.sql.Column,
                             selectivity: Double = Double.NaN,
                             idCol: String = "vec_id",
                             vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.functions.{count => cnt}
    val lists0 = store.read(listsTable(name))
    val s0 =
      if (!selectivity.isNaN) selectivity
      else {
        val r = lists0.agg(cnt(lit(1)), cnt(when(filter, 1))).first()
        if (r.getLong(0) == 0L) 1.0
        else r.getLong(1) * 1.0 / r.getLong(0)
      }
    // one centroid read serves both the widening bound and the search
    val cents = store.read(centroidsTable(name))
    val nlist = cents.count()
    val widened = math.min(nlist.toDouble,
      math.ceil(nprobe / math.max(s0, 1e-9))).toInt
    searchIvfCore(store, name, cents, probes, k, math.max(nprobe, widened),
      Some(filter), idCol, vecCol)
  }

  private def searchIvfCore(store: TableStore, name: String,
                            cents: DataFrame,
                            probes: DataFrame, k: Int, nprobe: Int,
                            listFilter: Option[org.apache.spark.sql.Column],
                            idCol: String, vecCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(probes.sparkSession)
    val pa = Similarity.assignTopClusters(probes, cents, nprobe,
        idCol, vecCol)
      .select(col(idCol).as("qid"), col(vecCol).as("qvec"), col("cent_id"))
    val lists00 = store.read(listsTable(name))
    // the attribute predicate lands directly on the scan: Catalyst
    // pushes it down, and the store's StatsFileIndex prunes list
    // files against it — filtering narrows the read, never the k
    val lists0 = listFilter.fold(lists00)(lists00.where)
    // the hive partition column's read-back type may be narrower than
    // the centroid ids' (directory-name inference); align BOTH the IN
    // literals and the join key to it, or the cast around the
    // partition attribute defeats static pruning
    val dt = lists0.schema("cent_id").dataType
    val needed = graft.lake.JobLabel(probes.sparkSession, "graft:ivf probe assign") {
      pa.select(col("cent_id").cast(dt)).distinct()
        .collect().map(_.get(0)).toIndexedSeq
    }
    if (needed.isEmpty)
      return pa.select(col("qid"), col("qid").as("vid"),
        lit(0.0).as("cos"), lit(0).as("rnk")).where(lit(false))
    val lists = lists0.where(col("cent_id").isin(needed: _*))
      .select(col("cent_id"), col(idCol).as("vid"), col(vecCol).as("vvec"))
    val scored = lists
      .join(pa.withColumn("cent_id", col("cent_id").cast(dt)), Seq("cent_id"))
      .where(col("qid") =!= col("vid"))
      .select(col("qid"), col("vid"),
        round(Similarity.cosine(col("qvec"), col("vvec")), 4).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vid"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }
}
