package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap

/** In-memory object store with S3 semantics, proving the swap-in
  * point for S3-class backends: the claim is an atomic conditional
  * PUT (`If-None-Match: *` → putIfAbsent), the manifest publish is
  * ONE direct overwrite write (an S3 PUT is an atomic replace; no
  * rename exists there, so the Hadoop temp+rename path would be
  * wrong). Claims live in the fake bucket's key space, not on the
  * filesystem. */
final class FakeS3Primitive extends CommitPrimitive {
  // claim object key -> claimedAtMs (the bucket's conditional-PUT ledger)
  private val bucket = new ConcurrentHashMap[String, Long]()
  private def key(tableDir: Path, v: Long): String =
    s"$tableDir/${CommitPrimitive.ClaimPrefix}$v"

  override def tryClaim(tableDir: Path, v: Long): Boolean =
    bucket.putIfAbsent(key(tableDir, v), System.currentTimeMillis()) == null

  override def publish(manifest: Path, content: String): Unit = {
    // one atomic PUT of the whole object. S3 readers see the old or
    // the new object, never a torn one — but a plain Files.write on a
    // LOCAL filesystem is not atomic, and a concurrent reader (an
    // appender carrying the current manifest) can observe a prefix
    // and silently drop the tail's files from every later commit
    // (caught by DisjointWritersSpec's hammer, rarely). Emulate the
    // PUT's atomicity with temp + ATOMIC_MOVE; the STORE still never
    // relies on rename for S3 — this is the fake's internal detail.
    val target = Paths.get(manifest.toUri)
    val tmp = target.resolveSibling(
      s".${target.getFileName}.put-${java.util.UUID.randomUUID()}")
    Files.write(tmp, content.getBytes("UTF-8"))
    Files.move(tmp, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  override def listClaims(tableDir: Path): Seq[(Long, Long)] = {
    val prefix = s"$tableDir/${CommitPrimitive.ClaimPrefix}"
    import scala.jdk.CollectionConverters._
    bucket.asScala.toSeq.collect {
      case (k, t) if k.startsWith(prefix) =>
        (k.stripPrefix(prefix).toLong, t)
    }
  }

  override def deleteClaim(tableDir: Path, v: Long): Unit =
    bucket.remove(key(tableDir, v))
}

/** One-shot fault injector: a writer that DIES between winning the
  * claim and publishing the manifest — the crash window TTL recovery
  * exists for. A dead process can't run its own exception cleanup, so
  * the crash also swallows the claim release the in-process failure
  * path would perform; an ordinary publish exception (validation,
  * write error) releases the claim and is tested elsewhere. */
final class Crashable(inner: CommitPrimitive) extends CommitPrimitive {
  @volatile var crashNextPublish = false
  @volatile var failNextPublish = false // survivable error, writer lives on
  @volatile private var dead = false
  override def tryClaim(d: Path, v: Long): Boolean = inner.tryClaim(d, v)
  override def publish(m: Path, c: String): Unit = {
    if (crashNextPublish) {
      crashNextPublish = false
      dead = true
      throw new RuntimeException("simulated writer crash before publish")
    }
    if (failNextPublish) {
      failNextPublish = false
      throw new RuntimeException("simulated transient publish failure")
    }
    inner.publish(m, c)
  }
  override def listClaims(d: Path): Seq[(Long, Long)] = inner.listClaims(d)
  override def deleteClaim(d: Path, v: Long): Unit = {
    if (dead) { dead = false; return } // the crashed writer's release never ran
    inner.deleteClaim(d, v)
  }
  override def promote(s: Path, d: Path,
                       c: org.apache.hadoop.conf.Configuration): Unit =
    inner.promote(s, d, c)
  override def discard(s: Path,
                       c: org.apache.hadoop.conf.Configuration): Unit =
    inner.discard(s, c)
}

/** The commit protocol's concurrency guarantees, proven against BOTH
  * primitives — O_EXCL (file/HDFS default) and conditional-PUT (the
  * S3 shape) — through the same TableStore code path. */
class CommitPrimitiveSpec extends SparkSpec {
  import spark.implicits._

  private def impls: Seq[(String, () => CommitPrimitive)] = Seq(
    ("o-excl", () => new HadoopCommitPrimitive(spark.sessionState.newHadoopConf())),
    ("cond-put-s3", () => new FakeS3Primitive))

  for ((name, mk) <- impls) {

    test(s"[$name] concurrent appends serialize via the claim, no lost update") {
      val store = new TableStore(spark, tmpDir("cp"), Some(mk()))
      store.create("t", Seq((0, "z")).toDF("id", "v"))
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = Seq(Seq((1, "a")), Seq((2, "b")), Seq((3, "c"))).map { rows =>
        new Thread(() =>
          try store.append("t", rows.toDF("id", "v"))
          catch { case e: Throwable => errs.add(e) })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errs.isEmpty, s"append failed: ${errs.peek()}")
      assert(store.read("t").select("id").as[Int].collect().sorted
        .toSeq == Seq(0, 1, 2, 3))
      assert(store.currentVersion("t").contains(3L))
    }

    test(s"[$name] racing writers on one txn watermark commit exactly once") {
      // two writers (zombie + replacement driver) deliver the SAME
      // batch id concurrently: the claim serializes them and the
      // in-claim watermark revalidation makes the loser a no-op —
      // exactly one copy of the rows lands, on BOTH primitives
      val store = new TableStore(spark, tmpDir("cp"), Some(mk()))
      store.create("t", Seq((0, "z")).toDF("id", "v"))
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to 3).map { _ =>
        new Thread(() =>
          try store.appendTxn("t", Seq((1, "a")).toDF("id", "v"),
            "stream-app", 42L)
          catch { case e: Throwable => errs.add(e) })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errs.isEmpty, s"appendTxn failed: ${errs.peek()}")
      assert(store.read("t").where("id = 1").count() == 1L,
        "a replayed watermark double-applied")
      assert(store.currentVersion("t").contains(1L))
      assert(store.lastTxn("t", "stream-app").contains(42L))
      // a later batch from the survivor still goes through
      store.appendTxn("t", Seq((2, "b")).toDF("id", "v"), "stream-app", 43L)
      assert(store.read("t").count() == 3L)
    }

    test(s"[$name] a foreign claim blocks the version until TTL recovery") {
      val prim = mk()
      val root = tmpDir("cp")
      val store = new TableStore(spark, root, Some(prim))
      store.create("t", Seq((1, "a")).toDF("id", "v"))
      // another writer claims v1 and goes silent
      assert(prim.tryClaim(new Path(s"file:$root/t"), 1L))
      intercept[IllegalArgumentException] {
        store.append("t", Seq((2, "b")).toDF("id", "v"))
      }
      // young claims survive; past the TTL the version is reclaimed
      assert(store.recoverStaleClaims("t", ttlMs = 60 * 60 * 1000L).isEmpty)
      assert(store.recoverStaleClaims("t", ttlMs = 0L) == Seq(1L))
      store.append("t", Seq((2, "b")).toDF("id", "v"))
      assert(store.read("t").select("id").as[Int].collect().sorted
        .toSeq == Seq(1, 2))
    }

    test(s"[$name] crash between claim and publish never tears a manifest") {
      val crashable = new Crashable(mk())
      val store = new TableStore(spark, tmpDir("cp"), Some(crashable))
      store.create("t", Seq((1, "a")).toDF("id", "v"))
      crashable.crashNextPublish = true
      intercept[RuntimeException] {
        store.overwrite("t", Seq((9, "z")).toDF("id", "v"))
      }
      // the claim leaked but no manifest was published: readers still
      // see v0 intact, v1 is blocked...
      assert(store.currentVersion("t").contains(0L))
      assert(store.read("t").as[(Int, String)].collect().toSeq == Seq((1, "a")))
      intercept[IllegalArgumentException] {
        store.append("t", Seq((2, "b")).toDF("id", "v"))
      }
      // ...until TTL takeover re-opens it
      assert(store.recoverStaleClaims("t", ttlMs = 0L) == Seq(1L))
      store.append("t", Seq((2, "b")).toDF("id", "v"))
      assert(store.currentVersion("t").contains(1L))
      assert(store.read("t").select("id").as[Int].collect().sorted
        .toSeq == Seq(1, 2))
    }

    test(s"[$name] a SURVIVING publish failure releases its claim at once") {
      val crashable = new Crashable(mk())
      val store = new TableStore(spark, tmpDir("cp"), Some(crashable))
      store.create("t", Seq((1, "a")).toDF("id", "v"))
      crashable.failNextPublish = true
      intercept[RuntimeException] {
        store.append("t", Seq((2, "b")).toDF("id", "v"))
      }
      // the live writer released v1 on its way out: the next commit
      // claims it immediately — no TTL takeover, no 100-attempt stall
      assert(store.currentVersion("t").contains(0L))
      store.append("t", Seq((3, "c")).toDF("id", "v"))
      assert(store.currentVersion("t").contains(1L))
      assert(store.read("t").select("id").as[Int].collect().sorted
        .toSeq == Seq(1, 3))
    }
  }
}
