package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Two-writer snapshot-isolation contract for rewrite commits: a
  * rewrite computed from version `rs` must ABORT — never silently
  * win — when another writer committed a data or schema change after
  * `rs` (Delta ConflictChecker semantics). Before the readSnapshot
  * check existed, every scenario here silently dropped the concurrent
  * writer's commit: the UPDATE rewrote the table from its stale read
  * and published over the append. */
/** Primitive wrapper that, while ARMED, runs `hook` once immediately
  * before the next claim attempt — injecting a concurrent writer into
  * the exact window between a rewrite's pinned read and its winning
  * claim, the race the snapshot check exists for. */
final class RaceInjector(inner: CommitPrimitive)
    extends CommitPrimitive {
  @volatile var hook: () => Unit = () => ()
  @volatile var armed = false
  override def tryClaim(d: org.apache.hadoop.fs.Path, v: Long): Boolean = {
    if (armed) { armed = false; hook() }
    inner.tryClaim(d, v)
  }
  override def publish(m: org.apache.hadoop.fs.Path, c: String): Unit =
    inner.publish(m, c)
  override def listClaims(d: org.apache.hadoop.fs.Path): Seq[(Long, Long)] =
    inner.listClaims(d)
  override def deleteClaim(d: org.apache.hadoop.fs.Path, v: Long): Unit =
    inner.deleteClaim(d, v)
  override def promote(s: org.apache.hadoop.fs.Path,
                       d: org.apache.hadoop.fs.Path,
                       c: org.apache.hadoop.conf.Configuration): Unit =
    inner.promote(s, d, c)
  override def discard(s: org.apache.hadoop.fs.Path,
                       c: org.apache.hadoop.conf.Configuration): Unit =
    inner.discard(s, c)
}

class ConflictSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore() = new TableStore(spark, tmpDir("conflict"))

  /** (injected store, plain store over the same root, the injector). */
  private def racingStores(): (TableStore, TableStore, RaceInjector) = {
    val root = tmpDir("conflict-race")
    val inj = new RaceInjector(
      new HadoopCommitPrimitive(spark.sessionState.newHadoopConf()))
    (new TableStore(spark, root, Some(inj)), new TableStore(spark, root), inj)
  }

  test("stale overwrite loses to a concurrent append: conflict, append survives") {
    val store = freshStore()
    store.create("t", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    // writer A pins its snapshot and computes a rewrite (an UPDATE)
    val rs = store.currentVersion("t").get
    val updated = store.readVersion("t", rs)
      .withColumn("v", when(col("id") === 1, lit("A")).otherwise(col("v")))
    // writer B appends BEFORE A commits
    store.append("t", Seq((3, "c")).toDF("id", "v"))
    val e = intercept[SnapshotConflictException] {
      store.overwrite("t", updated, readSnapshot = Some(rs))
    }
    assert(e.getMessage.contains("concurrent data change"))
    // B's append is intact; A's rewrite left no trace (no version bump,
    // no orphan rows)
    assert(store.currentVersion("t").contains(1L))
    assert(store.read("t").orderBy("id").as[(Int, String)].collect()
      .toSeq == Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("blind overwrite (no snapshot) keeps last-writer-wins") {
    val store = freshStore()
    store.create("t", Seq((1, "a")).toDF("id", "v"))
    store.append("t", Seq((2, "b")).toDF("id", "v"))
    // INSERT OVERWRITE semantics: replaces whatever is there
    store.overwrite("t", Seq((9, "z")).toDF("id", "v"))
    assert(store.read("t").as[(Int, String)].collect().toSeq == Seq((9, "z")))
  }

  test("rewrite against the current head commits cleanly") {
    val store = freshStore()
    store.create("t", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    val rs = store.currentVersion("t").get
    store.overwrite("t",
      store.readVersion("t", rs).where(col("id") =!= 1),
      readSnapshot = Some(rs))
    assert(store.read("t").as[(Int, String)].collect().toSeq == Seq((2, "b")))
  }

  test("metadata-only commit in between is harmless: no conflict") {
    val store = freshStore()
    store.create("t", Seq((1, "a"), (2, "b")).toDF("id", "v"),
      partitionBy = Seq("id"))
    val rs = store.currentVersion("t").get
    val survivors = store.readVersion("t", rs).where(col("id") =!= 1)
    // partition evolution publishes a content-identical manifest —
    // provably harmless to the pending rewrite
    store.setPartitioning("t", Nil)
    store.overwrite("t", survivors, readSnapshot = Some(rs))
    assert(store.read("t").select("id", "v").as[(Int, String)].collect()
      .toSeq == Seq((2, "b")))
  }

  test("concurrent column rename conflicts (schema change)") {
    val store = freshStore()
    store.create("t", Seq((1, "a")).toDF("id", "v"))
    val rs = store.currentVersion("t").get
    store.renameColumn("t", "v", "val")
    // even a frame that happens to align with the NEW schema must not
    // publish over a rename it never saw: the claim-time colmap check
    // fires regardless of column-name luck. (A frame still carrying
    // the OLD names fails earlier, loudly, in write validation.)
    val e = intercept[SnapshotConflictException] {
      store.overwrite("t", store.read("t"), readSnapshot = Some(rs))
    }
    assert(e.getMessage.contains("schema change"))
  }

  test("concurrent MoR delete markers conflict a stale rewrite") {
    val store = freshStore()
    store.create("t", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    val rs = store.currentVersion("t").get
    val rewrite = store.readVersion("t", rs)
    store.appendWithDeletes("t", Seq((2, "B")).toDF("id", "v"),
      Seq(Tuple1(2)).toDF("id"))
    intercept[SnapshotConflictException] {
      store.overwrite("t", rewrite, readSnapshot = Some(rs))
    }
    // the MoR merge result is untouched
    assert(store.read("t").orderBy("id").as[(Int, String)].collect()
      .toSeq == Seq((1, "a"), (2, "B")))
  }

  test("SQL UPDATE aborts when an append REALLY races in after its read") {
    // end-to-end through the DML front door with an injected racer:
    // the wrapper primitive appends a row from a second store handle
    // in the window between the UPDATE's pinned read and its claim
    val (storeInj, plain, inj) = racingStores()
    plain.create("t", Seq((1, 10L), (2, 20L)).toDF("id", "amt"))
    inj.hook = () => plain.append("t", Seq((3, 30L)).toDF("id", "amt"))
    inj.armed = true
    intercept[SnapshotConflictException] {
      GraftSql.execute(spark, storeInj,
        "UPDATE t SET amt = amt + 1 WHERE id = 1")
    }
    // the racer's append survives; the stale UPDATE left no trace
    assert(plain.read("t").orderBy("id").as[(Int, Long)].collect()
      .toSeq == Seq((1, 10L), (2, 20L), (3, 30L)))
    // sanity: without a racer the same statement commits
    GraftSql.execute(spark, storeInj,
      "UPDATE t SET amt = amt + 1 WHERE id = 1")
    assert(plain.read("t").orderBy("id").as[(Int, Long)].collect()
      .toSeq == Seq((1, 11L), (2, 20L), (3, 30L)))
  }

  test("compact recomputes on a lost race instead of dropping the racer") {
    val store = freshStore()
    store.create("t", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    store.appendWithDeletes("t", Seq((2, "B")).toDF("id", "v"),
      Seq(Tuple1(2)).toDF("id"))
    assert(store.deleteDebt("t") > 0)
    store.compact("t")
    assert(store.deleteDebt("t") == 0)
    assert(store.read("t").orderBy("id").as[(Int, String)].collect()
      .toSeq == Seq((1, "a"), (2, "B")))
  }

  test("compactSmall recomputes when a folding file is rewritten away mid-fold") {
    // inject a DELETE-rewrite between compactSmall's manifest read and
    // its claim: the files it planned to fold leave the manifest, the
    // carried-callback guard conflicts, and the retry recomputes from
    // the new head — the deleted row must NOT resurrect through the
    // folded copies
    val (storeInj, plain, inj) = racingStores()
    plain.create("t", Seq((1, "a")).toDF("id", "v"))
    plain.append("t", Seq((2, "b")).toDF("id", "v"))
    plain.append("t", Seq((3, "c")).toDF("id", "v"))
    inj.hook = () =>
      GraftSql.execute(spark, plain, "DELETE FROM t WHERE id = 2")
    inj.armed = true
    storeInj.compactSmall("t", minBytes = 1L << 20)
    assert(plain.read("t").orderBy("id").as[(Int, String)].collect()
      .toSeq == Seq((1, "a"), (3, "c")),
      "row 2 resurrected through a stale fold")
  }

  test("compactSmall aborts loudly when MoR delete markers race in mid-fold") {
    // concurrent equality-delete markers would be silently escaped by
    // the folded copies (a commit's own rows are exempt): the guard
    // conflicts, and the recompute then refuses on pending delete debt
    val (storeInj, plain, inj) = racingStores()
    plain.create("t", Seq((1, "a")).toDF("id", "v"))
    plain.append("t", Seq((2, "b")).toDF("id", "v"))
    plain.append("t", Seq((3, "c")).toDF("id", "v"))
    inj.hook = () => plain.appendWithDeletes("t",
      Seq((2, "B")).toDF("id", "v"), Seq(Tuple1(2)).toDF("id"))
    inj.armed = true
    val e = intercept[IllegalArgumentException] {
      storeInj.compactSmall("t", minBytes = 1L << 20)
    }
    assert(e.getMessage.contains("compact first"))
    // nothing escaped the markers: the MoR merge result is intact
    assert(plain.read("t").orderBy("id").as[(Int, String)].collect()
      .toSeq == Seq((1, "a"), (2, "B"), (3, "c")))
  }

  test("vacuumed in-between version conflicts conservatively") {
    val store = freshStore()
    store.create("t", Seq((1, "a")).toDF("id", "v"))
    val rs = store.currentVersion("t").get
    val rewrite = store.readVersion("t", rs)
    store.append("t", Seq((2, "b")).toDF("id", "v"))
    store.append("t", Seq((3, "c")).toDF("id", "v"))
    store.vacuum("t", keep = 1) // drops manifests 0 and 1
    intercept[SnapshotConflictException] {
      store.overwrite("t", rewrite, readSnapshot = Some(rs))
    }
  }

  test("snapshot ahead of head (concurrent RESTORE/recreate) conflicts") {
    val store = freshStore()
    store.create("t", Seq((1, "a")).toDF("id", "v"))
    intercept[SnapshotConflictException] {
      store.overwrite("t", Seq((9, "z")).toDF("id", "v"),
        readSnapshot = Some(7L))
    }
  }
}
