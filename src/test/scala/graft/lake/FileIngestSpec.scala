package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** COPY INTO: exactly-once file ingest through the ledger + one
  * cross-table transaction. */
class FileIngestSpec extends SparkSpec {
  import spark.implicits._

  private def writeSrc(dir: String, name: String, rows: Seq[(Int, String)]): Unit =
    rows.toDF("id", "v").coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/$name")

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
    assert(store.read("t").select("id").as[Int].collect().sorted
      .toSeq == Seq(1, 2, 3))
    // the ledger records every ingested file exactly once
    assert(store.read(FileIngest.ledgerOf("t")).count() ==
      r1.filesLoaded + r3.filesLoaded)
  }

  test("a failing load unwinds BOTH the data and the ledger (exactly-once)") {
    val src = tmpDir("ci-src2")
    val store = new TableStore(spark, tmpDir("ci-store2"))
    writeSrc(src, "a", Seq((1, "ok"), (-5, "bad")))
    store.create("t", Seq((0, "seed")).toDF("id", "v"))
    store.addConstraint("t", "id_nonneg", "id >= 0")
    intercept[IllegalArgumentException] {
      FileIngest.copyInto(spark, store, "t", src)
    }
    assert(!store.inTransaction)
    assert(store.read("t").count() == 1)
    assert(!store.exists(FileIngest.ledgerOf("t")),
      "ledger must not record a file whose load rolled back")
    // the retry after fixing the data loads everything exactly once
    store.dropConstraint("t", "id_nonneg")
    val r = FileIngest.copyInto(spark, store, "t", src)
    assert(r.rowsLoaded == 2)
    assert(store.read("t").count() == 3)
  }

  test("overlapping COPY INTO runs never double-load: the loser conflicts and unwinds") {
    val src = tmpDir("ci-src4")
    val root = tmpDir("ci-store4")
    writeSrc(src, "a", Seq((1, "a")))
    val plain = new TableStore(spark, root)
    FileIngest.copyInto(spark, plain, "t", src) // seed the ledger
    writeSrc(src, "b", Seq((2, "b"), (3, "c")))
    // run A (injected store) reads the ledger, then — in the window
    // before its first claim — run B loads the same fresh files and
    // commits; A's snapshot-checked ledger append must conflict and
    // unwind A's staged data append with it
    val inj = new RaceInjector(
      new HadoopCommitPrimitive(spark.sessionState.newHadoopConf()))
    val storeA = new TableStore(spark, root, Some(inj))
    inj.hook = () => { FileIngest.copyInto(spark, plain, "t", src); () }
    inj.armed = true
    intercept[SnapshotConflictException] {
      FileIngest.copyInto(spark, storeA, "t", src)
    }
    assert(!storeA.inTransaction)
    // exactly ONE copy of the new rows (B's), never two
    assert(plain.read("t").select("id").as[Int].collect().sorted
      .toSeq == Seq(1, 2, 3))
    // A's retry sees B's ledger and no-ops
    assert(FileIngest.copyInto(spark, storeA, "t", src) ==
      FileIngest.Result(0, 0L))
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
  }
}
