package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partition-granular optimistic concurrency: two writers whose
  * footprints touch DISJOINT partitions both land without a logical
  * conflict — an append racing a partition-scoped overwrite of other
  * partitions no longer aborts it (the carried list re-carries the
  * racer's files); writers whose footprints INTERSECT still
  * serialize through SnapshotConflictException. Claims still
  * serialize the physical manifest chain (per-version manifests have
  * exactly one writer), but a lost claim costs a re-publish, never a
  * recompute — the spec pins that retry budget. */
class DisjointWritersSpec extends SparkSpec {
  import spark.implicits._

  private def part(p: String, n: Int, from: Int = 0): DataFrame =
    (1 to n).map(i => (from + i.toLong, p, i * 1.0)).toDF("id", "p", "x")

  /** Store whose next overwritePartitions gets `racer` injected
    * between its pinned read and its winning claim. */
  private def raced(rootDir: String): (TableStore, TableStore, RaceInjector) = {
    val inj = new RaceInjector(
      new HadoopCommitPrimitive(spark.sessionState.newHadoopConf()))
    (new TableStore(spark, rootDir, Some(inj)),
      new TableStore(spark, rootDir), inj)
  }

  test("append OUTSIDE the touched partitions does not conflict a scoped overwrite") {
    val (store, racerStore, inj) = raced(tmpDir("djw"))
    store.create("t", part("a", 5).unionByName(part("b", 5, 100)), Seq("p"))
    val rs = store.currentVersion("t").get
    // replacement for partition a only, computed from the pinned read
    val replacement = part("a", 2, 200)
    inj.armed = true
    inj.hook = () => racerStore.append("t", part("c", 3, 300))
    // the racer's append lands FIRST (inside the claim window); the
    // scoped overwrite must tolerate it — its files are outside p=a
    store.overwritePartitions("t", replacement, Seq("p=a"),
      readSnapshot = Some(rs), disjointAddsOk = true)
    val got = store.read("t").groupBy("p").count()
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L, "b" -> 5L, "c" -> 3L),
      s"racer's partition must survive the scoped overwrite: $got")
  }

  test("append INTO a touched partition still conflicts the scoped overwrite") {
    val (store, racerStore, inj) = raced(tmpDir("djw2"))
    store.create("t", part("a", 5).unionByName(part("b", 5, 100)), Seq("p"))
    val rs = store.currentVersion("t").get
    inj.armed = true
    inj.hook = () => racerStore.append("t", part("a", 1, 300))
    intercept[SnapshotConflictException] {
      // even WITH the disjoint-adds opt-in: the racer wrote INTO a
      // touched dir, so partition-granular detection must still abort
      store.overwritePartitions("t", part("a", 2, 200), Seq("p=a"),
        readSnapshot = Some(rs), disjointAddsOk = true)
    }
    // the racer's row is intact; the overwrite never half-applied
    assert(store.read("t").where(col("id") === 301L).count() == 1)
    assert(store.read("t").where(col("p") === "a").count() == 6)
  }

  test("concurrent MoR delete markers conflict a scoped overwrite (cross-partition)") {
    val (store, racerStore, inj) = raced(tmpDir("djw3"))
    store.create("t", part("a", 5).unionByName(part("b", 5, 100)), Seq("p"))
    val rs = store.currentVersion("t").get
    inj.armed = true
    // equality deletes apply across partition boundaries — even a
    // delete "aimed at" partition b must conflict a scoped overwrite
    // of partition a (its keys could match the replacement rows)
    inj.hook = () => racerStore.appendWithDeletes("t",
      part("b", 1, 400), deleteKeys = Seq(101L).toDF("id"))
    intercept[SnapshotConflictException] {
      store.overwritePartitions("t", part("a", 2, 200), Seq("p=a"),
        readSnapshot = Some(rs), disjointAddsOk = true)
    }
  }

  test("CDC merge tolerates a disjoint-partition append racing it end-to-end") {
    val (store, racerStore, inj) = raced(tmpDir("djw4"))
    store.create("t", part("a", 4).unionByName(part("b", 4, 100)), Seq("p"))
    val rs = store.currentVersion("t").get
    // the merge path's exact shape: replacement folds partition a's
    // old contents, racer appends to partition c in the claim window
    val replacement = store.readVersion("t", rs).where(col("p") === "a")
      .where(col("id") =!= 2L)
      .unionByName(part("a", 1, 500))
    inj.armed = true
    inj.hook = () => racerStore.append("t", part("c", 2, 300))
    store.overwritePartitions("t", replacement, Seq("p=a"),
      readSnapshot = Some(rs), disjointAddsOk = true, op = "MERGE")
    val got = store.read("t").groupBy("p").count()
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 4L, "b" -> 4L, "c" -> 2L), s"got $got")
  }

  private def hammer(primitive: Option[CommitPrimitive],
                     rootDir: String): Unit = {
    val mk = () => new TableStore(spark, rootDir, primitive)
    mk().create("t", part("seed", 1), Seq("p"))
    MetaMetrics.reset()
    val perThread = 6
    val threads = (0 until 2).map { w =>
      new Thread(() => {
        val s = mk()
        (0 until perThread).foreach { i =>
          s.append("t", part(s"w$w", 2, w * 10000 + i * 100))
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val store = mk()
    // every batch landed exactly once, versions are dense
    assert(store.currentVersion("t").contains(2L * perThread))
    val got = store.read("t").groupBy("p").count()
      .as[(String, Long)].collect().toMap
    assert(got == Map("seed" -> 1L, "w0" -> (2L * perThread),
      "w1" -> (2L * perThread)), s"got $got")
    // lost claims are re-publishes, not recomputes — and bounded: in
    // the worst interleaving every commit loses a handful of claim
    // races, never an unbounded spin (generous x4 budget kills flake)
    val conflicts = MetaMetrics.claimConflicts.get()
    assert(conflicts <= 4L * 2 * perThread,
      s"claim retries exploded: $conflicts for ${2 * perThread} commits")
  }

  test("two-thread disjoint appends: all land, bounded claim retries (Hadoop primitive)") {
    hammer(None, tmpDir("djw5"))
  }

  test("two-thread disjoint appends: all land, bounded claim retries (S3-class primitive)") {
    hammer(Some(new FakeS3Primitive), tmpDir("djw6"))
  }

  /** Soak: a CONTINUOUS appender on partition `a` races a merge loop
    * repeatedly rewriting partition `m` from pinned snapshots. With
    * partition-granular conflict detection the merge must see ZERO
    * snapshot conflicts — every in-between commit is a disjoint pure
    * append — and both writers' final states must be exact. */
  private def mergeAppendSoak(primitive: Option[CommitPrimitive],
                              rootDir: String): Unit = {
    val mk = () => new TableStore(spark, rootDir, primitive)
    val store = mk()
    store.create("t", part("m", 3).unionByName(part("a", 1, 9000)), Seq("p"))
    val appends = 6
    val merges = 4
    val conflicts = new java.util.concurrent.atomic.AtomicInteger
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val appender = new Thread(() => {
      try {
        val s = mk()
        (0 until appends).foreach { i =>
          s.append("t", part("a", 2, 10000 + i * 100)); Thread.sleep(10)
        }
      } catch { case t: Throwable => failure.compareAndSet(null, t) }
    })
    val merger = new Thread(() => {
      try {
        val s = mk()
        (1 to merges).foreach { g =>
          val rs = s.currentVersion("t").get
          // generation g replaces partition m outright — deterministic
          // final state no matter how the appends interleave
          val replacement = part("m", 3, g * 1000)
            .withColumn("x", col("x") + lit(g * 1.0))
          s.overwritePartitions("t", replacement, Seq("p=m"),
            readSnapshot = Some(rs), disjointAddsOk = true, op = "MERGE")
          Thread.sleep(15)
        }
      } catch {
        case _: SnapshotConflictException => conflicts.incrementAndGet()
        case t: Throwable => failure.compareAndSet(null, t)
      }
    })
    appender.start(); merger.start()
    appender.join(60000); merger.join(60000)
    if (failure.get() != null) throw failure.get()
    assert(conflicts.get() == 0,
      s"disjoint merge∥append soak hit ${conflicts.get()} snapshot " +
        "conflicts — partition-granular detection failed")
    val got = store.read("t").groupBy("p").count()
      .as[(String, Long)].collect().toMap
    assert(got == Map("m" -> 3L, "a" -> (1L + 2L * appends)), s"got $got")
    // partition m holds exactly the LAST generation's rows
    val mIds = store.read("t").where(col("p") === "m")
      .select("id").as[Long].collect().sorted.toSeq
    assert(mIds == Seq(merges * 1000L + 1, merges * 1000L + 2,
      merges * 1000L + 3), s"m partition: $mIds")
    assert(store.currentVersion("t").contains((appends + merges).toLong))
  }

  test("merge∥append soak on disjoint partitions: zero snapshot conflicts (Hadoop primitive)") {
    mergeAppendSoak(None, tmpDir("djw7"))
  }

  test("merge∥append soak on disjoint partitions: zero snapshot conflicts (S3-class primitive)") {
    mergeAppendSoak(Some(new FakeS3Primitive), tmpDir("djw8"))
  }
}
