package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

/** COPY INTO: single-commit exactly-once file ingest — the ledger
  * rides the data table's own manifest (`#ingest=` headers), so no
  * crash point can separate "data published" from "ledger recorded".
  */
class FileIngestSpec extends SparkSpec {
  import spark.implicits._

  /** Wrapper that dies immediately AFTER a successful manifest
    * publish — the old two-commit design's worst case ("data
    * published, ledger not"); with the single-commit design the
    * ledger is inside the published manifest, so the retry must
    * no-op. */
  private final class CrashAfterPublish(inner: CommitPrimitive)
      extends CommitPrimitive {
    @volatile var armed = false
    override def tryClaim(d: Path, v: Long): Boolean = inner.tryClaim(d, v)
    override def publish(m: Path, c: String): Unit = {
      inner.publish(m, c)
      if (armed) { armed = false
        throw new RuntimeException("simulated crash after publish") }
    }
    override def listClaims(d: Path): Seq[(Long, Long)] = inner.listClaims(d)
    override def deleteClaim(d: Path, v: Long): Unit = inner.deleteClaim(d, v)
  }

  private def writeSrc(dir: String, name: String, rows: Seq[(Int, String)]): Unit =
    rows.toDF("id", "v").coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/$name")

  private def ids(store: TableStore, t: String = "t"): Seq[Int] =
    store.read(t).select("id").as[Int].collect().sorted.toSeq

  test("a regular-FILE source lists as itself (Hadoop listFiles parity): loads once, re-run no-ops") {
    // COPY INTO callers pass single files, not just directories; the
    // local nio listing must return the file as a one-element listing
    // exactly like FileSystem.listFiles(file, true) does.
    val src = tmpDir("ci-file-src")
    writeSrc(src, "a", Seq((1, "a"), (2, "b"), (3, "c")))
    val part = new java.io.File(s"$src/a").listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).head
    val single = new java.io.File(src, "docs.parquet")
    java.nio.file.Files.copy(part.toPath, single.toPath)

    val listed = FsListing.dataFilesWithMeta(
      new Path(single.getAbsolutePath), spark.sparkContext.hadoopConfiguration)
    assert(listed.map(_._1) == Seq(new Path(single.toURI).toString))
    assert(listed.head._2 == single.length())

    val store = new TableStore(spark, tmpDir("ci-file-store"))
    val r1 = FileIngest.copyInto(spark, store, "t", single.getAbsolutePath)
    assert(r1 == FileIngest.Result(1, 3L))
    assert(ids(store) == Seq(1, 2, 3))
    assert(FileIngest.copyInto(spark, store, "t", single.getAbsolutePath) ==
      FileIngest.Result(0, 0L))
    assert(ids(store) == Seq(1, 2, 3))
  }

  test("loads a directory once; re-run is a no-op; new files load incrementally") {
    val src = tmpDir("ci-src")
    val store = new TableStore(spark, tmpDir("ci-store"))
    writeSrc(src, "a", Seq((1, "a"), (2, "b")))
    val r1 = FileIngest.copyInto(spark, store, "t", src)
    assert(r1.rowsLoaded == 2 && r1.filesLoaded >= 1)
    assert(store.read("t").count() == 2)
    // idempotent: nothing new
    assert(FileIngest.copyInto(spark, store, "t", src) ==
      FileIngest.Result(0, 0L))
    assert(store.read("t").count() == 2)
    // a later drop loads ONLY the new files
    writeSrc(src, "b", Seq((3, "c")))
    val r3 = FileIngest.copyInto(spark, store, "t", src)
    assert(r3.rowsLoaded == 1)
    assert(ids(store) == Seq(1, 2, 3))
    // the ledger is manifest headers, not a second table
    assert(store.tables() == Seq("t"))
    assert(FileIngest.ledger(spark, store, "t").count() ==
      r1.filesLoaded + r3.filesLoaded)
  }

  test("the ledger survives unrelated commits (append/overwrite/delete carry it)") {
    val src = tmpDir("ci-carry")
    val store = new TableStore(spark, tmpDir("ci-carry-store"))
    writeSrc(src, "a", Seq((1, "a")))
    FileIngest.copyInto(spark, store, "t", src)
    store.append("t", Seq((100, "x")).toDF("id", "v"))
    store.deleteWhere("t", org.apache.spark.sql.functions.col("id") === 100)
    // were the ledger forgotten, this would re-load file a
    assert(FileIngest.copyInto(spark, store, "t", src) ==
      FileIngest.Result(0, 0L))
    assert(ids(store) == Seq(1))
  }

  test("a failing load publishes NOTHING — neither rows nor ledger entries") {
    val src = tmpDir("ci-src2")
    val store = new TableStore(spark, tmpDir("ci-store2"))
    writeSrc(src, "a", Seq((1, "ok"), (-5, "bad")))
    store.create("t", Seq((0, "seed")).toDF("id", "v"))
    store.addConstraint("t", "id_nonneg", "id >= 0")
    intercept[IllegalArgumentException] {
      FileIngest.copyInto(spark, store, "t", src)
    }
    assert(store.read("t").count() == 1)
    assert(FileIngest.ledger(spark, store, "t").count() == 0,
      "a rolled-back load must not mark its files ingested")
    // the retry after fixing the data loads everything exactly once
    store.dropConstraint("t", "id_nonneg")
    val r = FileIngest.copyInto(spark, store, "t", src)
    assert(r.rowsLoaded == 2)
    assert(store.read("t").count() == 3)
  }
  // The exactly-once crash/race suites run against BOTH commit
  // primitives — O_EXCL file create (HDFS/file://) and the fake-S3
  // conditional PUT — so the claim is proven where the object-store
  // swap actually happens, not just on the rename-capable backend.
  private def primitives: Seq[(String, () => CommitPrimitive)] = Seq(
    ("o-excl", () =>
      new HadoopCommitPrimitive(spark.sessionState.newHadoopConf())),
    ("cond-put-s3", () => new FakeS3Primitive))

  for ((pname, mk) <- primitives) {
    test(s"[$pname] crash BEFORE the manifest publish: retry loads the batch exactly once") {
      val src = tmpDir("ci-crash1")
      val crashable = new Crashable(mk())
      val store = new TableStore(spark, tmpDir("ci-crash1-store"), Some(crashable))
      writeSrc(src, "a", Seq((1, "a")))
      FileIngest.copyInto(spark, store, "t", src)
      writeSrc(src, "b", Seq((2, "b"), (3, "c")))
      crashable.crashNextPublish = true
      intercept[RuntimeException] { FileIngest.copyInto(spark, store, "t", src) }
      // nothing published: the table still reads the seed batch only
      assert(ids(store) == Seq(1))
      // the dead writer's claim unblocks via TTL takeover, then the
      // retry loads b's rows ONCE — never zero, never twice
      store.recoverStaleClaims("t", ttlMs = 0L)
      val r = FileIngest.copyInto(spark, store, "t", src)
      assert(r.rowsLoaded == 2)
      assert(ids(store) == Seq(1, 2, 3))
    }

    test(s"[$pname] crash AFTER the manifest publish: data AND ledger landed, retry no-ops") {
      val src = tmpDir("ci-crash2")
      val prim = new CrashAfterPublish(mk())
      val store = new TableStore(spark, tmpDir("ci-crash2-store"), Some(prim))
      writeSrc(src, "a", Seq((1, "a")))
      FileIngest.copyInto(spark, store, "t", src)
      writeSrc(src, "b", Seq((2, "b")))
      prim.armed = true
      intercept[RuntimeException] { FileIngest.copyInto(spark, store, "t", src) }
      // the commit landed atomically WITH its ledger — the state the
      // old two-commit design could not guarantee
      assert(ids(store) == Seq(1, 2))
      assert(FileIngest.copyInto(spark, store, "t", src) ==
        FileIngest.Result(0, 0L))
      assert(ids(store) == Seq(1, 2))
    }

    test(s"[$pname] overlapping runs from two stores never double-load: loser retries and no-ops") {
      val src = tmpDir("ci-src4")
      val root = tmpDir("ci-store4")
      writeSrc(src, "a", Seq((1, "a")))
      // both stores must share ONE primitive instance: the fake S3
      // bucket's conditional-PUT ledger lives in the primitive (two
      // Hadoop primitives share state through the filesystem instead)
      val shared = mk()
      val plain = new TableStore(spark, root, Some(shared))
      FileIngest.copyInto(spark, plain, "t", src) // seed the ledger
      writeSrc(src, "b", Seq((2, "b"), (3, "c")))
      // run A (injected store) reads the ledger, then — in the window
      // before its first claim — run B loads the same fresh files and
      // commits; A's snapshot-checked commit conflicts internally,
      // retries against B's ledger, and must report a no-op
      val inj = new RaceInjector(shared)
      val storeA = new TableStore(spark, root, Some(inj))
      inj.hook = () => { FileIngest.copyInto(spark, plain, "t", src); () }
      inj.armed = true
      assert(FileIngest.copyInto(spark, storeA, "t", src) ==
        FileIngest.Result(0, 0L))
      // exactly ONE copy of the new rows (B's), never two
      assert(ids(plain) == Seq(1, 2, 3))
    }

    test(s"[$pname] concurrent same-store copyInto threads load the batch exactly once") {
      val src = tmpDir("ci-src5p")
      val store = new TableStore(spark, tmpDir("ci-store5p"), Some(mk()))
      writeSrc(src, "a", Seq((1, "a"), (2, "b")))
      val results = new java.util.concurrent.ConcurrentLinkedQueue[FileIngest.Result]()
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to 2).map { _ =>
        new Thread(() =>
          try results.add(FileIngest.copyInto(spark, store, "t", src))
          catch { case e: Throwable => errs.add(e) })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errs.isEmpty, s"copyInto failed: ${errs.peek()}")
      import scala.jdk.CollectionConverters._
      assert(results.asScala.map(_.rowsLoaded).sum == 2L)
      assert(ids(store) == Seq(1, 2))
    }
  }


  test("a drifted batch evolves the table union-by-name instead of failing") {
    val src = tmpDir("ci-evolve")
    val store = new TableStore(spark, tmpDir("ci-evolve-store"))
    writeSrc(src, "a", Seq((1, "a")))
    FileIngest.copyInto(spark, store, "t", src)
    Seq((2, "b", 9.5)).toDF("id", "v", "score").coalesce(1)
      .write.mode("overwrite").parquet(s"$src/b")
    val r = FileIngest.copyInto(spark, store, "t", src)
    assert(r.rowsLoaded == 1)
    val rows = store.read("t").orderBy("id")
      .select("id", "v", "score").as[(Int, String, Option[Double])]
      .collect().toSeq
    assert(rows == Seq((1, "a", None), (2, "b", Some(9.5))))
  }

  test("the exactness report costs no second scan: source records read exactly once") {
    val src = tmpDir("ci-once")
    val store = new TableStore(spark, tmpDir("ci-once-store"))
    writeSrc(src, "a", Seq((1, "a"), (2, "b"), (3, "c")))
    val read = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          read.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = FileIngest.copyInto(spark, store, "t", src)
      // listener events are async — wait for the counter to go quiet
      var last = -1L
      var spins = 0
      while (read.get() != last && spins < 100) {
        last = read.get(); spins += 1; Thread.sleep(100)
      }
      // the reported count comes from the write's own footers, and
      // matches the actual table delta...
      assert(r.rowsLoaded == 3)
      // ...with the 3 source records read ONCE (the write). The old
      // exact-report df.count() read them a second time — at a daily
      // 100 TB drop that was the whole batch scanned twice.
      assert(read.get() == 3,
        s"source scanned ${read.get()} records — a second pass snuck in")
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(store.read("t").count() == 3)
  }

  test("the mtime watermark prunes the ledger and bounds the lookback window") {
    val src = tmpDir("ci-wm")
    val store = new TableStore(spark, tmpDir("ci-wm-store"))
    val fs = new Path(src).getFileSystem(spark.sessionState.newHadoopConf())
    def setTimes(name: String, t: Long): Unit =
      FsListing.dataFiles(new Path(s"$src/$name"), spark.sessionState.newHadoopConf())
        .foreach(f => fs.setTimes(new Path(f), t, t))
    writeSrc(src, "a", Seq((1, "a"))); setTimes("a", 1000L)
    FileIngest.copyInto(spark, store, "t", src, slackMs = 0L)
    writeSrc(src, "b", Seq((2, "b"))); setTimes("b", 5000L)
    FileIngest.copyInto(spark, store, "t", src, slackMs = 0L)
    // a's entry (mtime 1000 < wm 5000) is pruned from the carried
    // header; b's (at the watermark) is retained
    val led = FileIngest.ledger(spark, store, "t")
      .select("mtime").as[Long].collect().toSeq
    assert(led == Seq(5000L))
    // re-run: a is excluded by the mtime rule (no ledger entry
    // needed), b by its entry — a no-op either way
    assert(FileIngest.copyInto(spark, store, "t", src, slackMs = 0L) ==
      FileIngest.Result(0, 0L))
    // the documented caveat, pinned: a file BACKDATED below the
    // watermark bound is assumed already ingested and skipped...
    writeSrc(src, "c", Seq((3, "c"))); setTimes("c", 4000L)
    assert(FileIngest.copyInto(spark, store, "t", src, slackMs = 0L) ==
      FileIngest.Result(0, 0L))
    // ...while slack admits it (bound 5000 - 2000 <= 4000)
    val r = FileIngest.copyInto(spark, store, "t", src, slackMs = 2000L)
    assert(r.rowsLoaded == 1)
    assert(ids(store) == Seq(1, 2, 3))
  }

  test("a file OVERWRITTEN in place never reloads: its entry refreshes to the new mtime") {
    val src = tmpDir("ci-mod")
    val store = new TableStore(spark, tmpDir("ci-mod-store"))
    val fs = new Path(src).getFileSystem(spark.sessionState.newHadoopConf())
    def setTimes(name: String, t: Long): Unit =
      FsListing.dataFiles(new Path(s"$src/$name"), spark.sessionState.newHadoopConf())
        .foreach(f => fs.setTimes(new Path(f), t, t))
    writeSrc(src, "a", Seq((1, "a"))); setTimes("a", 1000L)
    FileIngest.copyInto(spark, store, "t", src, slackMs = 0L)
    // a is overwritten IN PLACE (same file PATH, new bytes, new
    // mtime) while a sibling advances the watermark past a's ORIGINAL
    // mtime — the stale-recorded entry must refresh to the listed
    // mtime instead of pruning, or the next run would see a as
    // "fresh" and reload (duplicate) its originally ingested rows
    locally {
      val conf = spark.sessionState.newHadoopConf()
      val aFile = new Path(FsListing.dataFiles(new Path(s"$src/a"), conf).head)
      val tmp = tmpDir("ci-mod-tmp")
      writeSrc(tmp, "x", Seq((9, "z")))
      val nFile = new Path(FsListing.dataFiles(new Path(s"$tmp/x"), conf).head)
      org.apache.hadoop.fs.FileUtil.copy(fs, nFile, fs, aFile, false, true, conf)
    }
    setTimes("a", 6000L)
    writeSrc(src, "b", Seq((2, "b"))); setTimes("b", 5000L)
    val r2 = FileIngest.copyInto(spark, store, "t", src, slackMs = 0L)
    assert(r2.rowsLoaded == 1, s"only b is fresh, got $r2")
    // the refreshed entry survives the prune at the NEW mtime (6000
    // >= wm 6000); b's entry (5000 < bound) prunes as usual — the
    // stale 1000 would have pruned too, re-exposing a as "fresh"
    val led = FileIngest.ledger(spark, store, "t")
      .select("mtime").as[Long].collect().toSeq.sorted
    assert(led == Seq(6000L), s"ledger mtimes: $led")
    // re-run: a stays skipped BY PATH (file-based exactly-once keeps
    // the originally ingested rows; modified content is not reloaded)
    assert(FileIngest.copyInto(spark, store, "t", src, slackMs = 0L) ==
      FileIngest.Result(0, 0L))
    assert(ids(store) == Seq(1, 2))
  }

  test("overlapping ingest roots never reload: skip and prune share one bound") {
    val src = tmpDir("ci-nest")
    val store = new TableStore(spark, tmpDir("ci-nest-store"))
    val fs = new Path(src).getFileSystem(spark.sessionState.newHadoopConf())
    def setTimes(name: String, t: Long): Unit =
      FsListing.dataFiles(new Path(s"$src/$name"), spark.sessionState.newHadoopConf())
        .foreach(f => fs.setTimes(new Path(f), t, t))
    // the INNER root ingests an old file...
    writeSrc(src, "sub/a", Seq((1, "a"))); setTimes("sub/a", 1000L)
    FileIngest.copyInto(spark, store, "t", s"$src/sub", slackMs = 0L)
    // ...then a SECOND inner file advances the inner watermark past
    // a's mtime, pruning a's ledger entry
    writeSrc(src, "sub/b", Seq((2, "b"))); setTimes("sub/b", 5000L)
    FileIngest.copyInto(spark, store, "t", s"$src/sub", slackMs = 0L)
    // a FIRST-EVER run on the ENCLOSING root: its own watermark is
    // -inf, but the inner root's watermark covers a and b — neither
    // may reload even though a's ledger entry is pruned
    writeSrc(src, "c", Seq((3, "c"))); setTimes("c", 6000L)
    val r = FileIngest.copyInto(spark, store, "t", src, slackMs = 0L)
    assert(r.rowsLoaded == 1, s"outer first run must load ONLY c, got $r")
    assert(ids(store) == Seq(1, 2, 3))
    // and a re-run on the inner root stays a no-op
    assert(FileIngest.copyInto(spark, store, "t", s"$src/sub", slackMs = 0L) ==
      FileIngest.Result(0, 0L))
    assert(ids(store) == Seq(1, 2, 3))
  }

  test("PATTERN restricts the listing to matching relative paths") {
    val src = tmpDir("ci-pat")
    val store = new TableStore(spark, tmpDir("ci-pat-store"))
    writeSrc(src, "keep/a", Seq((1, "a")))
    writeSrc(src, "skip/b", Seq((2, "b")))
    // standard glob semantics: a bare '*' does NOT cross '/' — a
    // top-level '*.parquet' matches nothing here (all files nest)
    assert(FileIngest.copyInto(spark, store, "t0", src,
      pattern = Some("*.parquet")) == FileIngest.Result(0, 0L))
    val r = FileIngest.copyInto(spark, store, "t", src,
      pattern = Some("keep/*/*.parquet"))
    assert(r.rowsLoaded == 1)
    assert(ids(store) == Seq(1))
    // the same pattern re-run is a no-op; a broader SQL run then
    // picks up the rest
    assert(FileIngest.copyInto(spark, store, "t", src,
      pattern = Some("keep/*/*.parquet")) == FileIngest.Result(0, 0L))
    val m = GraftSql.execute(spark, store,
      s"COPY INTO t FROM '$src' PATTERN = 'skip/*/*.parquet'")
    assert(m.select("rows_loaded").as[Long].head() == 1L)
    assert(ids(store) == Seq(1, 2))
  }

  test("a PATTERN run never advances the watermark past files it excluded") {
    val src = tmpDir("ci-pat-wm")
    val store = new TableStore(spark, tmpDir("ci-pat-wm-store"))
    val fs = new Path(src).getFileSystem(spark.sessionState.newHadoopConf())
    def setTimes(name: String, t: Long): Unit =
      FsListing.dataFiles(new Path(s"$src/$name"), spark.sessionState.newHadoopConf())
        .foreach(f => fs.setTimes(new Path(f), t, t))
    // an old excluded file and a new matching one
    writeSrc(src, "b/old", Seq((1, "old"))); setTimes("b/old", 1000L)
    writeSrc(src, "a/new", Seq((2, "new"))); setTimes("a/new", 9000L)
    val r1 = FileIngest.copyInto(spark, store, "t", src, slackMs = 0L,
      pattern = Some("a/**"))
    assert(r1.rowsLoaded == 1)
    // were the pattern run to set watermark=9000, the unrestricted
    // run would skip b/old (mtime 1000) forever — silent data loss
    val r2 = FileIngest.copyInto(spark, store, "t", src, slackMs = 0L)
    assert(r2.rowsLoaded == 1, "the excluded old file must still ingest")
    assert(ids(store) == Seq(1, 2))
  }

  test("SQL COPY INTO surface returns metrics and stays idempotent") {
    val src = tmpDir("ci-src3")
    val store = new TableStore(spark, tmpDir("ci-store3"))
    writeSrc(src, "a", Seq((1, "x"), (2, "y"), (3, "z")))
    val m = GraftSql.execute(spark, store, s"COPY INTO tci FROM '$src'")
    assert(m.select("rows_loaded").as[Long].head() == 3L)
    val m2 = GraftSql.execute(spark, store, s"COPY INTO tci FROM '$src'")
    assert(m2.select("files_loaded").as[Int].head() == 0)
    assert(store.read("tci").count() == 3)
    // the ledger is inspectable through SQL: file rows + the root's
    // listing watermark, straight from the manifest header
    val led = GraftSql.execute(spark, store, "DESCRIBE INGEST tci")
    assert(led.where(col("kind") === "file").count() >= 1)
    assert(led.where(col("kind") === "watermark").count() == 1)
  }
}
