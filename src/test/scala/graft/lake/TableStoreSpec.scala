package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TableStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore() = new TableStore(spark, tmpDir("store"))

  test("exists is false before create, true after") {
    val store = freshStore()
    assert(!store.exists("t"))
    store.create("t", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    assert(store.exists("t"))
    assert(store.currentVersion("t").contains(0L))
  }

  test("create fails on existing table") {
    val store = freshStore()
    store.create("t", Seq((1, "a")).toDF("id", "v"))
    intercept[IllegalArgumentException] {
      store.create("t", Seq((2, "b")).toDF("id", "v"))
    }
  }

  test("read returns what was written") {
    val store = freshStore()
    store.create("t", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    assert(store.read("t").orderBy("id").as[(Int, String)].collect()
      .toSeq == Seq((1, "a"), (2, "b")))
  }

  test("overwrite bumps version and replaces content atomically") {
    val store = freshStore()
    store.create("t", Seq((1, "a")).toDF("id", "v"))
    store.overwrite("t", Seq((9, "z")).toDF("id", "v"))
    assert(store.currentVersion("t").contains(1L))
    assert(store.read("t").as[(Int, String)].collect().toSeq == Seq((9, "z")))
    // old snapshot still readable (time travel)
    assert(store.readVersion("t", 0L).as[(Int, String)].collect()
      .toSeq == Seq((1, "a")))
    assert(store.versions("t") == Seq(0L, 1L))
  }

  test("append unions with current content") {
    val store = freshStore()
    store.create("t", Seq((1, "a")).toDF("id", "v"))
    store.append("t", Seq((2, "b")).toDF("id", "v"))
    assert(store.read("t").orderBy("id").as[(Int, String)].collect()
      .toSeq == Seq((1, "a"), (2, "b")))
    assert(store.currentVersion("t").contains(1L))
  }

  test("append is O(batch): carries v0 files by reference, writes only new ones") {
    val store = freshStore()
    store.create("t", Seq((1, "a")).toDF("id", "v"))
    val v0Files = store.manifest("t", 0L)
    store.append("t", Seq((2, "b")).toDF("id", "v"))
    val v1Files = store.manifest("t", 1L)
    // v1 manifest = v0 files (by reference, byte-identical paths) +
    // the new batch's files in a commit dir v0 never wrote to
    assert(v0Files.toSet.subsetOf(v1Files.toSet))
    val newFiles = v1Files.toSet.diff(v0Files.toSet)
    assert(newFiles.nonEmpty)
    def commitDir(f: String) = f.split("/").takeWhile(!_.startsWith("part-")).last
    assert(newFiles.map(commitDir).intersect(v0Files.map(commitDir).toSet).isEmpty)
  }

  test("concurrent appends both survive via the optimistic claim") {
    val store = freshStore()
    store.create("t", Seq((0, "z")).toDF("id", "v"))
    val dfA = Seq((1, "a")).toDF("id", "v")
    val dfB = Seq((2, "b")).toDF("id", "v")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq(dfA, dfB).map { d =>
      new Thread(() =>
        try store.append("t", d) catch { case e: Throwable => errs.add(e) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"append failed: ${errs.peek()}")
    // no lost update: both batches present, two distinct claimed versions
    assert(store.read("t").select("id").as[Int].collect().sorted
      .toSeq == Seq(0, 1, 2))
    assert(store.currentVersion("t").contains(2L))
  }

  test("compactSmall folds tiny files, carries well-sized ones by reference") {
    val store = freshStore()
    // one "big" commit (10k rows -> tens of KB) + several 1-row appends
    store.create("t", spark.range(10000).toDF("id")
      .withColumn("v", lit("x")).repartition(1))
    (1 to 4).foreach(i => store.append("t", Seq((100000 + i).toLong)
      .toDF("id").withColumn("v", lit("y"))))
    val before = store.manifest("t", store.currentVersion("t").get)
    val bigFiles = store.manifest("t", 0L)
    val folded = store.compactSmall("t", minBytes = 10000)
    assert(folded == 4, s"expected the 4 tiny appends folded, got $folded")
    val after = store.manifest("t", store.currentVersion("t").get)
    // big file carried byte-identically; tiny files replaced by fewer
    assert(bigFiles.forall(after.contains))
    assert(after.size < before.size)
    // content unchanged
    assert(store.read("t").count() == 10004)
    assert(store.read("t").where($"v" === "y").count() == 4)
    // one small file left at most: second pass is a no-op, no commit
    val v = store.currentVersion("t").get
    assert(store.compactSmall("t", minBytes = 10000) == 0)
    assert(store.currentVersion("t").contains(v))
  }

  test("fastRowCount answers from metadata; history reports per version") {
    val store = freshStore()
    store.create("t", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    store.append("t", Seq((3, "c")).toDF("id", "v"))
    // no scan: counts come from the commit-time footer fold
    assert(store.fastRowCount("t").contains(3L))
    // pending equality deletes -> metadata can't be exact
    store.appendWithDeletes("t", Seq((4, "d")).toDF("id", "v"),
      Seq(1).toDF("id"))
    assert(store.fastRowCount("t").isEmpty)
    // compaction folds the debt; metadata is exact again
    store.compact("t")
    assert(store.fastRowCount("t").contains(3L))
    val h = store.history("t").orderBy("version")
      .select("version", "n_files", "n_delete_entries", "n_rows")
      .as[(Long, Int, Int, Option[Long])].collect()
    assert(h.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(h(0)._3 == 0 && h(0)._4.contains(2L))
    assert(h(1)._4.contains(3L))
    assert(h(2)._3 == 1 && h(2)._4.isEmpty) // the MoR version
    assert(h(3)._3 == 0 && h(3)._4.contains(3L))
  }

  test("CHECK constraints gate writes; NULL passes; violations abort atomically") {
    val store = freshStore()
    store.create("t", Seq((1, Some(10)), (2, None)).toDF("id", "v"))
    // NULL v passes SQL CHECK semantics, so this applies cleanly
    store.addConstraint("t", "v_pos", "v > 0")
    assert(store.constraints("t") == Map("v_pos" -> "v > 0"))
    // valid batch commits; violating batch aborts with no version bump
    store.append("t", Seq((3, Some(5))).toDF("id", "v"))
    val v = store.currentVersion("t").get
    val e = intercept[IllegalArgumentException] {
      store.append("t", Seq((4, Some(-1)), (5, Some(2))).toDF("id", "v"))
    }
    assert(e.getMessage.contains("v_pos"))
    assert(store.currentVersion("t").contains(v))
    assert(store.read("t").count() == 3)
    // a constraint existing data violates is rejected at ADD time
    val e2 = intercept[IllegalArgumentException] {
      store.addConstraint("t", "id_big", "id > 100")
    }
    assert(e2.getMessage.contains("existing row"))
    // dropped constraint stops gating
    store.dropConstraint("t", "v_pos")
    store.append("t", Seq((6, Some(-7))).toDF("id", "v"))
    assert(store.read("t").count() == 4)
  }

  test("vacuumOlderThan retains by time, never the current version") {
    val store = freshStore()
    store.create("t", Seq((1, "a")).toDF("id", "v"))
    store.overwrite("t", Seq((2, "b")).toDF("id", "v"))
    store.overwrite("t", Seq((3, "c")).toDF("id", "v"))
    // everything is younger than an hour: nothing vacuumed
    store.vacuumOlderThan("t", ttlMs = 3600 * 1000L)
    assert(store.versions("t") == Seq(0L, 1L, 2L))
    // ttl 0: every non-current version expires
    store.vacuumOlderThan("t", ttlMs = 0L)
    assert(store.versions("t") == Seq(2L))
    assert(store.read("t").select("id").as[Int].collect().toSeq == Seq(3))
  }

  test("vacuum after append keeps carried files alive") {
    val store = freshStore()
    store.create("t", Seq((1, "a")).toDF("id", "v"))
    store.append("t", Seq((2, "b")).toDF("id", "v"))
    store.vacuum("t", keep = 1)
    // v0's files are still referenced by v1's manifest -> must survive
    assert(store.read("t").orderBy("id").as[(Int, String)].collect()
      .toSeq == Seq((1, "a"), (2, "b")))
  }

  test("append on missing table creates it") {
    val store = freshStore()
    store.append("t", Seq((1, "a")).toDF("id", "v"))
    assert(store.exists("t") && store.currentVersion("t").contains(0L))
  }

  test("vacuum drops old snapshots but never the current one") {
    val store = freshStore()
    store.create("t", Seq((1, "a")).toDF("id", "v"))
    store.overwrite("t", Seq((2, "b")).toDF("id", "v"))
    store.overwrite("t", Seq((3, "c")).toDF("id", "v"))
    assert(store.versions("t") == Seq(0L, 1L, 2L))
    store.vacuum("t", keep = 1)
    assert(store.versions("t") == Seq(2L))
    assert(store.read("t").as[(Int, String)].collect().toSeq == Seq((3, "c")))
  }

  test("recoverStaleClaims unblocks a crash between claim and publish") {
    val root = tmpDir("store")
    val store = new TableStore(spark, root)
    store.create("t", Seq((1, "a")).toDF("id", "v"))
    // simulate a writer that died after claiming v1, before its manifest
    val orphan = java.nio.file.Paths.get(root, "t", ".claim-1")
    java.nio.file.Files.createFile(orphan)
    // v1 is deadlocked: every attempt loses the claim
    intercept[IllegalArgumentException] {
      store.append("t", Seq((2, "b")).toDF("id", "v"))
    }
    // a claim younger than the TTL is left alone (its writer may be alive)
    assert(store.recoverStaleClaims("t", ttlMs = 60 * 60 * 1000L).isEmpty)
    assert(java.nio.file.Files.exists(orphan))
    // past the TTL it is recovered and the version becomes claimable
    assert(store.recoverStaleClaims("t", ttlMs = 0L) == Seq(1L))
    assert(!java.nio.file.Files.exists(orphan))
    store.append("t", Seq((2, "b")).toDF("id", "v"))
    assert(store.read("t").orderBy("id").as[(Int, String)].collect()
      .toSeq == Seq((1, "a"), (2, "b")))
  }

  test("vacuumOrphans sweeps unreferenced commit dirs past the TTL only") {
    val root = tmpDir("store")
    val store = new TableStore(spark, root)
    store.create("t", Seq((1, "a")).toDF("id", "v"))
    // simulate a writer that wrote its commit dir then died pre-claim
    val orphan = java.nio.file.Paths.get(root, "t", "d-orphan")
    java.nio.file.Files.createDirectory(orphan)
    java.nio.file.Files.writeString(orphan.resolve("part-0.parquet"), "x")
    // fresh orphan survives a TTL'd sweep (its writer may be alive)
    assert(store.vacuumOrphans("t", ttlMs = 60 * 60 * 1000L).isEmpty)
    assert(java.nio.file.Files.exists(orphan))
    // past the TTL it is deleted; the referenced commit dir is not
    assert(store.vacuumOrphans("t", ttlMs = 0L) == Seq("d-orphan"))
    assert(!java.nio.file.Files.exists(orphan))
    assert(store.read("t").count() == 1)
  }

  test("recoverStaleClaims never touches a published version's claim") {
    val root = tmpDir("store")
    val store = new TableStore(spark, root)
    store.create("t", Seq((1, "a")).toDF("id", "v"))
    store.append("t", Seq((2, "b")).toDF("id", "v"))
    // claims 0 and 1 both have manifests — nothing to recover even at ttl 0
    assert(store.recoverStaleClaims("t", ttlMs = 0L).isEmpty)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(root, "t", ".claim-1")))
  }

  test("append evolves schema union-by-name (mergeSchema semantics)") {
    val store = freshStore()
    store.create("t", Seq((1, "a")).toDF("id", "v"))
    store.append("t", Seq((2, 3.5)).toDF("id", "extra"))
    val out = store.read("t").orderBy("id")
    assert(out.columns.toSet == Set("id", "v", "extra"))
    val rows = out.collect()
    assert(rows(0).getAs[String]("v") == "a" && rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).getAs[Double]("extra") == 3.5)
  }

  test("commit time is an explicit manifest header, independent of fs mtime") {
    val store = freshStore()
    val t0 = System.currentTimeMillis()
    store.create("t", Seq((1, "a")).toDF("id", "v"))
    Thread.sleep(3)
    store.append("t", Seq((2, "b")).toDF("id", "v"))
    val t1 = System.currentTimeMillis()
    val c0 = store.commitTimeMs("t", 0)
    val c1 = store.commitTimeMs("t", 1)
    // monotone, ms precision, bracketed by the wall clock — and NOT
    // quantized to a 1s mtime grid (the two commits are <1s apart yet
    // must resolve distinctly for TIMESTAMP AS OF)
    assert(t0 <= c0 && c0 < c1 && c1 <= t1)
    assert(store.versionAsOf("t", c0).contains(0L))
    assert(store.versionAsOf("t", c1 - 1).contains(0L))
    assert(store.versionAsOf("t", c1).contains(1L))
    assert(store.versionAsOf("t", t0 - 1).isEmpty)
  }

  test("convert rejects a non-uniform partition layout loudly") {
    val root = tmpDir("store")
    val store = new TableStore(spark, root)
    Seq((1, "a", "p1"), (2, "b", "p2")).toDF("id", "v", "part")
      .write.partitionBy("part").parquet(s"$root/tmix")
    // a stray UNPARTITIONED file in the same dir: adopting partition
    // keys from whichever file lists first would be silently wrong
    Seq((3, "c")).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(s"$root/tmix")
    val e = intercept[IllegalArgumentException] { store.convert("tmix") }
    assert(e.getMessage.contains("non-uniform partition layout"))
    assert(!store.exists("tmix"))
  }
}
