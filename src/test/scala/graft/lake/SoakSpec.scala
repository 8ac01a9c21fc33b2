package graft.lake

import graft.SparkSpec
import graft.ops.{Similarity, VectorIndex}
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.{AtomicBoolean, AtomicReference}

/** Maintenance-vs-ingest soak: one index table under CONTINUOUS
  * exactly-once micro-batch ingest (StreamingVectorIndex.ingestBatch's
  * appendTxn watermark, including at-least-once redeliveries) racing
  * a live maintenance loop (txn recovery → claim recovery → orphan
  * sweep → compact → vacuum → bloom refresh, the MaintenanceJob.run
  * order) and cold concurrent readers. Invariants at every moment and
  * at the end:
  *
  *   - every batch lands EXACTLY once (redeliveries no-op);
  *   - no reader ever throws (retention covers reader latency — the
  *     same contract Delta documents for vacuum);
  *   - the final table equals a sequential replay of the same batches
  *     with no maintenance at all.
  *
  * Parameterized over BOTH commit primitives (O_EXCL file create and
  * the fake-S3 conditional PUT), so the race windows are exercised
  * where the backend swap happens. Builds on ConflictSpec (injected
  * claim races), CommitPrimitiveSpec (crash windows), and
  * TransactionRecoverySpec (mid-swing recovery); this spec is the
  * sustained-load composition of all three. */
class SoakSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(from: Int, n: Int) =
    (from until from + n).map { i =>
      val base = (i % 4) * 10.0f
      (i.toLong, Array.tabulate(8)(d => base + ((i * 7 + d * 3) % 5) * 0.1f))
    }.toDF("vec_id", "embedding")

  /** One maintenance pass in MaintenanceJob.run's exact order, against
    * a store sharing the soak's commit primitive (MaintenanceJob.run
    * itself always builds a default-primitive store; its behavior is
    * covered by MaintenanceJobSpec). The claim TTL far exceeds the
    * soak runtime — takeover of a LIVE writer's claim is a different
    * failure mode, tested by the TTL suites. */
  private def maintPass(store: TableStore, table: String): Unit = {
    val ttl = 10 * 60 * 1000L
    store.recoverTransactions(ttl)
    store.recoverStaleClaims(table, ttl)
    store.vacuumOrphans(table, ttl)
    // a compaction rewrite that keeps losing its snapshot race to the
    // live ingest DEFERS to the next pass — the scheduled-job shape
    // (the debt stays readable meanwhile; the post-soak pass below
    // asserts it does fold once the table quiets)
    if (store.deleteDebt(table) >= 1)
      try store.compact(table)
      catch { case _: SnapshotConflictException => () }
    store.vacuum(table, keep = 100)
    store.refreshBloomIndexes(table)
  }

  for ((pname, mkPrim) <- Seq[(String, () => Option[CommitPrimitive])](
      ("o-excl", () => None),
      ("fake-s3", () => Some(new FakeS3Primitive))))
  test(s"bound index follows a hot corpus: sync keeps parity, the " +
    s"janitor's priority claim bounds merge-on-read debt [$pname]") {
    val root = tmpDir("soak-idx")
    val prim = mkPrim()
    val store = new TableStore(spark, root, prim)
    store.create("corpus", corpus(0, 100))
    VectorIndex.buildIvfIndexFromTable(store, "ix", "corpus",
      nlist = 4, kmeansIters = 1)

    val nBatches = 10
    val batchSize = 20
    def batch(i: Int) = corpus(100 + i * batchSize, batchSize)

    // every appendWithDeletes adds one del line; the maintenance loop
    // folds at >= 2 and — with the janitor priority claim — LANDS the
    // fold even though ingest never pauses, so post-pass debt can
    // only be what raced in during the fold itself
    val debtCeiling = 6
    val maxDebtAfterPass = new java.util.concurrent.atomic.AtomicInteger(0)
    val stop = new AtomicBoolean(false)
    val failure = new AtomicReference[Throwable](null)
    def guarded(r: => Unit): Runnable = () =>
      try r catch { case t: Throwable =>
        failure.compareAndSet(null, t); stop.set(true) }

    val maintStore = new TableStore(spark, root, prim)
    val lt = VectorIndex.listsTable("ix")
    val maint = new Thread(guarded {
      val ttl = 10 * 60 * 1000L
      while (!stop.get()) {
        maintStore.recoverTransactions(ttl)
        maintStore.recoverStaleClaims("corpus", ttl)
        maintStore.vacuumOrphans("corpus", ttl)
        // the MaintenanceJob pass shape: index sync first (append-only
        // feed range), then the debt folds — compact() now escalates
        // to its priority claim instead of deferring forever
        VectorIndex.syncIvfIndex(maintStore, "ix", "corpus")
        if (maintStore.deleteDebt("corpus") >= 2)
          maintStore.compact("corpus")
        if (maintStore.deleteDebt(lt) >= 2) maintStore.compact(lt)
        val d = maintStore.deleteDebt("corpus")
        maxDebtAfterPass.getAndUpdate(m => math.max(m, d))
        Thread.sleep(30)
      }
    })
    maint.start()
    try {
      (0 until nBatches).foreach { i =>
        // hot ingest with merge-on-read debt accrual: each batch
        // appends AND equality-deletes a key from an earlier batch
        store.appendWithDeletes("corpus", batch(i),
          Seq(100L + i).toDF("vec_id"))
      }
    } finally { stop.set(true); maint.join(60000) }
    if (failure.get() != null) throw failure.get()

    assert(maxDebtAfterPass.get() <= debtCeiling,
      s"debt after a maintenance pass reached ${maxDebtAfterPass.get()} " +
        s"(> $debtCeiling): the fold is starving under ingest")

    // final catch-up, then ivf_ann_synced-style parity: the index
    // serves exactly what an in-query search over the corpus's final
    // state (with the index's own centroids) serves
    VectorIndex.syncIvfIndex(store, "ix", "corpus")
    val deleted = (1 until nBatches).map(i => 100L + i).toSet
    val ids = store.read(lt).select("vec_id").as[Long].collect().toSeq
    assert(ids.size == ids.distinct.size, "a synced id landed twice")
    assert(ids.toSet ==
      (0L until (100L + nBatches * batchSize)).filterNot(deleted).toSet)
    val cents = store.read(VectorIndex.centroidsTable("ix"))
    val probes = corpus(0, 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rnk", "vid", "cos").orderBy("qid", "rnk")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).toSeq
    val got = rows(VectorIndex.searchIvfIndex(store, "ix", probes,
      k = 5, nprobe = 3))
    val replay = rows(Similarity.ivfSearch(store.read("corpus"), probes,
      cents, k = 5, nprobe = 3))
    assert(got.nonEmpty && got == replay,
      "soaked index diverged from the corpus replay")
  }

  for ((pname, mkPrim) <- Seq[(String, () => Option[CommitPrimitive])](
      ("o-excl", () => None),
      ("fake-s3", () => Some(new FakeS3Primitive))))
  test(s"bound materialized view follows a hot source: refresh keeps " +
    s"parity while ingest never pauses [$pname]") {
    val root = tmpDir("soak-mv")
    val prim = mkPrim()
    val store = new TableStore(spark, root, prim)
    def rows(from: Int, n: Int) =
      (from until from + n).map(i =>
        (i.toLong, s"g${i % 3}", (i % 7).toDouble)).toDF("id", "g", "x")
    store.create("src", rows(0, 50))
    MaterializedView.create(store, "mv", "src", Seq("g"), Seq("x"))

    val nBatches = 10
    val batchSize = 20
    val stop = new AtomicBoolean(false)
    val failure = new AtomicReference[Throwable](null)
    def guarded(r: => Unit): Runnable = () =>
      try r catch { case t: Throwable =>
        failure.compareAndSet(null, t); stop.set(true) }
    val maintStore = new TableStore(spark, root, prim)
    val maint = new Thread(guarded {
      while (!stop.get()) {
        // MaintenanceJob's view pass shape against the live source:
        // refresh from the feed, fold the partials, bound the debt
        MaterializedView.refresh(maintStore, "mv")
        MaterializedView.compactPartials(maintStore, "mv")
        if (maintStore.deleteDebt("src") >= 2) maintStore.compact("src")
        Thread.sleep(30)
      }
    })
    maint.start()
    try {
      (0 until nBatches).foreach { i =>
        // appends AND an equality delete per batch — the view must
        // fold both directions while its refresher races this writer
        store.appendWithDeletes("src", rows(50 + i * batchSize, batchSize),
          Seq(50L + i).toDF("id"))
      }
    } finally { stop.set(true); maint.join(60000) }
    if (failure.get() != null) throw failure.get()

    // final catch-up, then parity vs a from-scratch recompute
    MaterializedView.refresh(store, "mv")
    val got = MaterializedView.read(store, "mv")
      .select("g", "cnt", "sum_x").orderBy("g")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    val want = store.read("src")
      .groupBy("g").agg(count(lit(1)).as("cnt"), sum("x").as("sum_x"))
      .orderBy("g")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got == want, s"soaked view diverged:\n got  $got\n want $want")
  }

  for ((pname, mkPrim) <- Seq[(String, () => Option[CommitPrimitive])](
      ("o-excl", () => None),
      // ONE shared instance per leg: the fake bucket's claim ledger is
      // per-instance state, so every racing store must share it — on
      // real S3 the bucket itself is the shared ledger
      ("fake-s3", () => Some(new FakeS3Primitive))))
  test(s"continuous ingest races maintenance and readers: exactly-once, " +
    s"replay-equal, no reader failure [$pname]") {
    val root = tmpDir("soak")
    val prim = mkPrim()
    val store = new TableStore(spark, root, prim)
    val seed = corpus(0, 100)
    VectorIndex.buildIvfIndex(store, "ix", seed, nlist = 4, kmeansIters = 1)
    val lt = VectorIndex.listsTable("ix")
    store.buildBloomIndex(lt, "vec_id") // gives the bloom refresh real work

    val nBatches = 12
    val batchSize = 20
    def batch(i: Int) = corpus(100 + i * batchSize, batchSize)

    val stop = new AtomicBoolean(false)
    val failure = new AtomicReference[Throwable](null)
    def guarded(r: => Unit): Runnable = () =>
      try r catch { case t: Throwable =>
        failure.compareAndSet(null, t); stop.set(true) }

    // maintenance loop: its own store instance over the same root and
    // primitive — the real deployment shape (a separate scheduled job)
    val maintStore = new TableStore(spark, root, prim)
    val maint = new Thread(guarded {
      while (!stop.get()) { maintPass(maintStore, lt); Thread.sleep(50) }
    })
    // cold readers: a FRESH store instance per read (exercises the
    // _LATEST checkpoint hint path); a reader must never fail, and
    // with retention covering the whole run it must never see a
    // vacuumed version either
    val reader = new Thread(guarded {
      while (!stop.get()) {
        val n = new TableStore(spark, root, prim).read(lt).count()
        assert(n >= 100L, s"reader saw a torn table: $n rows")
        Thread.sleep(20)
      }
    })
    maint.start(); reader.start()
    try {
      (0 until nBatches).foreach { i =>
        graft.streaming.StreamingVectorIndex.ingestBatch(
          store, "ix", batch(i), batchId = i.toLong)
        // at-least-once: every third batch is redelivered (a zombie
        // replay of an id the watermark already carries must no-op)
        if (i % 3 == 2)
          graft.streaming.StreamingVectorIndex.ingestBatch(
            store, "ix", batch(i), batchId = i.toLong)
        // mid-soak delete wave: a dedup purge racing the ingest —
        // creates real merge-on-read debt, so the maintenance loop's
        // compact + bloom full-rebuild branches genuinely fire
        if (i == 5)
          VectorIndex.deleteFromIvfIndex(store, "ix",
            Seq(100L, 101L, 102L, 103L, 104L).toDF("vec_id"))
      }
    } finally {
      stop.set(true); maint.join(30000); reader.join(30000)
    }
    if (failure.get() != null) throw failure.get()

    // the table is quiet now: one more pass must win the compaction
    // race it kept deferring and fold the merge-on-read debt away
    maintPass(maintStore, lt)
    assert(store.deleteDebt(lt) == 0L,
      "post-soak maintenance failed to fold the delete debt")

    // exactly once: no duplicates, full coverage minus the purge
    val deleted = Set(100L, 101L, 102L, 103L, 104L)
    val ids = store.read(lt).select("vec_id").as[Long].collect().toSeq
    assert(ids.size == ids.distinct.size, "a redelivered batch double-landed")
    assert(!ids.exists(deleted), "a purged id survived the delete wave")
    assert(ids.size == 100 + nBatches * batchSize - deleted.size,
      s"expected ${100 + nBatches * batchSize - deleted.size} vectors, " +
        s"got ${ids.size}")

    // final state ≡ sequential replay with no maintenance: same
    // centroids (never retrained), same assignment of the surviving
    // corpus
    val cents = store.read(VectorIndex.centroidsTable("ix"))
    val all = seed.unionByName(
        (0 until nBatches).map(batch).reduce(_.unionByName(_)))
      .where(!col("vec_id").isin(deleted.toSeq: _*))
    val want = Similarity.assignClusters(all, cents)
      .select(col("cent_id").cast("long"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = store.read(lt)
      .select(col("cent_id").cast("long"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, "soaked table diverged from the sequential replay")
  }
}
