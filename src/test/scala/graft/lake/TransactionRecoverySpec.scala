package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** The recovery journal closes the transaction COMMIT's crash window:
  * COMMIT journals its intent durably before the first pointer swing,
  * so a writer dying mid-swing leaves a state `recoverTransactions`
  * resolves deterministically — intent present → roll FORWARD (all
  * tables advance), intent absent → roll BACK (none do). No
  * half-applied transaction survives recovery. */
class TransactionRecoverySpec extends SparkSpec {
  import spark.implicits._

  /** Dies on the Nth promote call — the writer crashing between a
    * two-table transaction's pointer swings. */
  private final class CrashOnPromote(inner: CommitPrimitive, dieOn: Int)
      extends CommitPrimitive {
    private var calls = 0
    override def tryClaim(d: Path, v: Long): Boolean = inner.tryClaim(d, v)
    override def publish(m: Path, c: String): Unit = inner.publish(m, c)
    override def listClaims(d: Path): Seq[(Long, Long)] = inner.listClaims(d)
    override def deleteClaim(d: Path, v: Long): Unit = inner.deleteClaim(d, v)
    override def promote(s: Path, d: Path,
                         c: org.apache.hadoop.conf.Configuration): Unit = {
      calls += 1
      if (calls == dieOn)
        throw new RuntimeException("simulated crash between pointer swings")
      inner.promote(s, d, c)
    }
  }

  private def seedTwoTables(root: String,
                            prim: Option[CommitPrimitive]): TableStore = {
    val store = new TableStore(spark, root, prim)
    store.create("a", Seq((1, "x")).toDF("id", "v"))
    store.create("b", Seq((10, "y")).toDF("id", "v"))
    store
  }

  test("crash between the swings: recovery rolls the journaled commit FORWARD") {
    val root = tmpDir("txnrec-fwd")
    val store = seedTwoTables(root, Some(new CrashOnPromote(
      new HadoopCommitPrimitive(spark.sessionState.newHadoopConf()), dieOn = 2)))
    store.beginTransaction()
    store.append("a", Seq((2, "x2")).toDF("id", "v"))
    store.append("b", Seq((11, "y2")).toDF("id", "v"))
    intercept[RuntimeException] { store.commitTransaction() }
    // the writer died half-applied: a advanced, b did not — the
    // exact state the journal exists for
    val fresh = new TableStore(spark, root)
    assert(fresh.currentVersion("a").contains(1L))
    assert(fresh.currentVersion("b").contains(0L))
    val (forward, back) = fresh.recoverTransactions(ttlMs = 0L)
    assert(forward.size == 1 && back.isEmpty)
    // BOTH tables advanced — the transaction happened, atomically
    assert(fresh.read("a").count() == 2)
    assert(fresh.read("b").count() == 2)
    // recovery is idempotent and leaves a writable store
    assert(fresh.recoverTransactions(ttlMs = 0L) == ((Nil, Nil)))
    fresh.append("b", Seq((12, "y3")).toDF("id", "v"))
    assert(fresh.read("b").count() == 3)
  }

  test("TTL takeover of a LIVE transaction surfaces at commit, never a silent half-commit") {
    val root = tmpDir("txnrec-takeover")
    val store = seedTwoTables(root, None)
    store.beginTransaction()
    store.append("a", Seq((2, "x2")).toDF("id", "v"))
    store.append("b", Seq((11, "y2")).toDF("id", "v"))
    // a janitor with a too-aggressive TTL rolls the still-live
    // transaction back (no intent journaled yet): the staged
    // manifests are discarded out from under the writer
    val janitor = new TableStore(spark, root)
    val (fwd, back) = janitor.recoverTransactions(ttlMs = 0L)
    assert(fwd.isEmpty && back.size == 1)
    // the live writer's COMMIT must now FAIL LOUDLY — both the staged
    // source and the destination are gone, so silently "succeeding"
    // would report a commit that never applied (the exact data-loss
    // mode the journal exists to prevent)
    val e = intercept[IllegalStateException] { store.commitTransaction() }
    assert(e.getMessage.contains("vanished before promotion"))
    // neither table advanced
    val fresh = new TableStore(spark, root)
    assert(fresh.currentVersion("a").contains(0L))
    assert(fresh.currentVersion("b").contains(0L))
  }

  test("crash BEFORE the journal write: recovery rolls the whole txn BACK") {
    val root = tmpDir("txnrec-back")
    val store = seedTwoTables(root, None)
    store.beginTransaction()
    store.append("a", Seq((2, "x2")).toDF("id", "v"))
    store.append("b", Seq((11, "y2")).toDF("id", "v"))
    // the writer dies without ever reaching COMMIT: no intent exists
    val fresh = new TableStore(spark, root)
    val (forward, back) = fresh.recoverTransactions(ttlMs = 0L)
    assert(forward.isEmpty && back.size == 1)
    // NEITHER table advanced, and the claims were released
    assert(fresh.currentVersion("a").contains(0L))
    assert(fresh.currentVersion("b").contains(0L))
    fresh.append("a", Seq((3, "x3")).toDF("id", "v"))
    assert(fresh.currentVersion("a").contains(1L))
  }

  test("recoverStaleClaims must not cannibalize a journaled commit's leftovers") {
    val root = tmpDir("txnrec-guard")
    val store = seedTwoTables(root, Some(new CrashOnPromote(
      new HadoopCommitPrimitive(spark.sessionState.newHadoopConf()), dieOn = 2)))
    store.beginTransaction()
    store.append("a", Seq((2, "x2")).toDF("id", "v"))
    store.append("b", Seq((11, "y2")).toDF("id", "v"))
    intercept[RuntimeException] { store.commitTransaction() }
    val fresh = new TableStore(spark, root)
    // claim takeover runs FIRST (any order must be safe): it may not
    // free b's intent-owed version or discard its staged manifest
    assert(fresh.recoverStaleClaims("b", ttlMs = 0L).isEmpty)
    val (forward, _) = fresh.recoverTransactions(ttlMs = 0L)
    assert(forward.size == 1)
    assert(fresh.read("b").count() == 2)
  }

  test("a LIVE transaction inside the TTL is untouched by recovery") {
    val root = tmpDir("txnrec-live")
    val store = seedTwoTables(root, None)
    store.beginTransaction()
    store.append("a", Seq((2, "x2")).toDF("id", "v"))
    // a concurrent janitor with a sane TTL sees the staged commit but
    // leaves it alone...
    val janitor = new TableStore(spark, root)
    assert(janitor.recoverTransactions(ttlMs = 60 * 60 * 1000L) == ((Nil, Nil)))
    // ...and the live transaction then commits normally
    store.commitTransaction()
    assert(janitor.read("a").count() == 2)
  }

  test("a script COMMIT dying between swings can only roll FORWARD, never half-apply") {
    val root = tmpDir("txnrec-script")
    val store = seedTwoTables(root, Some(new CrashOnPromote(
      new HadoopCommitPrimitive(spark.sessionState.newHadoopConf()), dieOn = 2)))
    // the script's COMMIT promotes a, dies on b; the failure handler
    // must NOT roll back (the intent is durable — discarding b's
    // staged manifest would strand the txn half-applied forever); it
    // finishes the swing instead, and the original failure surfaces
    val e = intercept[RuntimeException] {
      GraftSql.executeScript(spark, store,
        """BEGIN;
          |INSERT INTO a VALUES (2, 'x2');
          |INSERT INTO b VALUES (11, 'y2');
          |COMMIT""".stripMargin)
    }
    assert(e.getMessage.contains("simulated crash"))
    // both tables advanced — the all-or-nothing held through the crash
    val fresh = new TableStore(spark, root)
    assert(fresh.read("a").count() == 2)
    assert(fresh.read("b").count() == 2)
    assert(!store.inTransaction)
    // nothing left for recovery
    assert(fresh.recoverTransactions(ttlMs = 0L) == ((Nil, Nil)))
  }

  test("rollback is refused once the commit intent is journaled") {
    val root = tmpDir("txnrec-refuse")
    // dieOn=2 with only ONE staged table: the first promote dies
    val store = seedTwoTables(root, Some(new CrashOnPromote(
      new HadoopCommitPrimitive(spark.sessionState.newHadoopConf()), dieOn = 1)))
    store.beginTransaction()
    store.append("a", Seq((2, "x2")).toDF("id", "v"))
    intercept[RuntimeException] { store.commitTransaction() }
    val e = intercept[IllegalStateException] { store.rollbackTransaction() }
    assert(e.getMessage.contains("roll FORWARD"))
    // the retry resumes the swing and completes the commit
    store.commitTransaction()
    assert(!store.inTransaction)
    assert(new TableStore(spark, root).read("a").count() == 2)
  }

  test("vacuumOrphans must not reap a staged transaction's data dirs") {
    val root = tmpDir("txnrec-vac")
    val store = seedTwoTables(root, None)
    store.beginTransaction()
    store.append("b", Seq((11, "y2")).toDF("id", "v"))
    // an aggressive janitor (ttl=0) runs while the commit is staged:
    // the staged manifest references the new data dir, so the dir is
    // NOT an orphan — deleting it would let a later roll-forward
    // publish a manifest over vanished files
    val janitor = new TableStore(spark, root)
    assert(janitor.vacuumOrphans("b", ttlMs = 0L).isEmpty)
    store.commitTransaction()
    assert(janitor.read("b").orderBy("id").count() == 2)
    // after a ROLLBACK, the discarded staging's dirs DO orphan
    store.beginTransaction()
    store.append("b", Seq((12, "y3")).toDF("id", "v"))
    store.rollbackTransaction()
    assert(janitor.vacuumOrphans("b", ttlMs = 0L).nonEmpty)
    assert(janitor.read("b").count() == 2)
  }

  test("a second instance's write during an open transaction fails loudly, not silently") {
    val root = tmpDir("txnrec-guard2")
    val store = seedTwoTables(root, None)
    store.beginTransaction()
    store.append("a", Seq((2, "x2")).toDF("id", "v"))
    // instance-local transactions pin their versions via claims: an
    // outside writer cannot interleave — it exhausts its claim
    // attempts and surfaces the open transaction in the error
    val outside = new TableStore(spark, root)
    val e = intercept[IllegalArgumentException] {
      outside.append("a", Seq((9, "z")).toDF("id", "v"))
    }
    assert(e.getMessage.contains("transaction"))
    store.commitTransaction()
    assert(outside.read("a").count() == 2)
  }
}
