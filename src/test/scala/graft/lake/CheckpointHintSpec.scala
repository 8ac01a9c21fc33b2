package graft.lake

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The O(1)-metadata-read contract: resolving a table's current
  * version goes through the `_LATEST` checkpoint hint + forward
  * existence probes, NEVER a full `manifest-<n>` directory listing —
  * so read cost is independent of how many commits the table has
  * accrued (a streaming table at one commit per micro-batch collects
  * ~86k manifests/day; listing them per read was the last O(#commits)
  * term on the hot path). MetaMetrics counts the listing fallback. */
class CheckpointHintSpec extends SparkSpec {
  import spark.implicits._

  private def hintPath(root: String, table: String) =
    new Path(new Path(root, table), "_LATEST")

  private def writeHint(root: String, table: String, s: String): Unit = {
    val p = hintPath(root, table)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  private def grow(store: TableStore, table: String, n: Int): Unit =
    (1 to n).foreach(i => store.append(table, Seq((i, s"v$i")).toDF("id", "v")))

  test("reads list zero manifest directories once the hint exists, " +
    "independent of commit count") {
    val root = tmpDir("ckpt")
    val store = new TableStore(spark, root)
    store.create("t", Seq((0, "v0")).toDF("id", "v"))
    grow(store, "t", 10)

    // a COLD reader (fresh instance, nothing cached in memory) reads
    // through the on-disk hint: zero directory listings
    val reader10 = new TableStore(spark, root)
    MetaMetrics.reset()
    assert(reader10.read("t").count() == 11L)
    val listingsAt10 = MetaMetrics.manifestListings.get()
    assert(listingsAt10 == 0L,
      s"read at 11 commits performed $listingsAt10 manifest listings")

    // 50 more commits: the read's metadata cost must not grow with
    // table age — still zero listings, same row-correct result
    grow(store, "t", 50)
    val reader60 = new TableStore(spark, root)
    MetaMetrics.reset()
    assert(reader60.read("t").count() == 61L)
    assert(reader60.currentVersion("t").contains(60L))
    val listingsAt60 = MetaMetrics.manifestListings.get()
    assert(listingsAt60 == 0L,
      s"read at 61 commits performed $listingsAt60 manifest listings")
  }

  test("missing hint falls back to the full listing and repairs itself") {
    val root = tmpDir("ckpt")
    val store = new TableStore(spark, root)
    store.create("t", Seq((0, "v0")).toDF("id", "v"))
    grow(store, "t", 5)
    val p = hintPath(root, "t")
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, false)

    MetaMetrics.reset()
    assert(store.currentVersion("t").contains(5L))
    assert(MetaMetrics.manifestListings.get() >= 1L, "expected the fallback")
    // the fallback rewrote the hint: the next resolution lists nothing
    MetaMetrics.reset()
    assert(store.currentVersion("t").contains(5L))
    assert(MetaMetrics.manifestListings.get() == 0L)
  }

  test("stale hint forward-probes to the true frontier") {
    val root = tmpDir("ckpt")
    val store = new TableStore(spark, root)
    store.create("t", Seq((0, "v0")).toDF("id", "v"))
    grow(store, "t", 7)
    writeHint(root, "t", "2") // lower bound only — e.g. a lagging writer
    MetaMetrics.reset()
    assert(store.currentVersion("t").contains(7L))
    assert(MetaMetrics.manifestListings.get() == 0L,
      "a stale-but-valid hint must not trigger the listing fallback")
    assert(store.read("t").count() == 8L)
  }

  test("garbage hint and vacuumed-version hint both fall back correctly") {
    val root = tmpDir("ckpt")
    val store = new TableStore(spark, root)
    store.create("t", Seq((0, "v0")).toDF("id", "v"))
    grow(store, "t", 4)

    writeHint(root, "t", "not-a-number")
    assert(store.currentVersion("t").contains(4L))

    // hint pointing at a since-vacuumed version: manifest gone, the
    // probe base fails, listing fallback recovers the real current
    store.vacuum("t", keep = 1)
    writeHint(root, "t", "0")
    assert(store.currentVersion("t").contains(4L))
    assert(store.read("t").count() == 5L)
  }

  test("currentVersion equals versions.lastOption across commit kinds") {
    val root = tmpDir("ckpt")
    val store = new TableStore(spark, root)
    store.create("t", Seq((1, "a")).toDF("id", "v"))
    store.append("t", Seq((2, "b")).toDF("id", "v"))
    store.overwrite("t", Seq((3, "c"), (4, "d")).toDF("id", "v"))
    store.appendWithDeletes("t", Seq((5, "e")).toDF("id", "v"),
      Seq(3).toDF("id"))
    store.compact("t")
    assert(store.currentVersion("t") == store.versions("t").lastOption)
    assert(store.currentVersion("t").contains(4L))
  }

  test("transaction: staged commits are visible to the staging " +
    "instance, invisible to others, and the hint lands on swing") {
    val root = tmpDir("ckpt")
    val store = new TableStore(spark, root)
    store.create("t", Seq((1, "a")).toDF("id", "v"))
    val other = new TableStore(spark, root)
    store.beginTransaction()
    store.append("t", Seq((2, "b")).toDF("id", "v"))
    assert(store.currentVersion("t").contains(1L))
    assert(other.currentVersion("t").contains(0L))
    store.commitTransaction()
    // promoted manifest refreshed the hint: a cold reader resolves the
    // post-transaction version without any listing
    MetaMetrics.reset()
    assert(new TableStore(spark, root).currentVersion("t").contains(1L))
    assert(MetaMetrics.manifestListings.get() == 0L)
  }
}
