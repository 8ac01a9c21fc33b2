package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-15 read-path optimization: consecutive same-schema commit
  * groups with identical applicable delete/DV sets and flat file
  * layout serve from ONE scan instead of one scan per group (an
  * n-append table otherwise pays n listings + an n-way union EVERY
  * read). These specs pin the coalescing's correctness boundaries.
  */
class ScanCoalesceSpec extends SparkSpec {
  import spark.implicits._

  private def scanCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.toString
      .split('\n').count(_.contains("FileScan"))

  test("n same-schema appends read as ONE scan with all rows") {
    val store = new TableStore(spark, tmpDir("coal-basic"))
    val df = (1 to 5).map(i => (i, s"v$i")).toDF("id", "v")
    store.create("t", df)
    (1 to 9).foreach(_ => store.append("t", df))
    val r = store.read("t")
    assert(scanCount(r) == 1, s"expected one coalesced scan:\n$r")
    assert(r.count() == 50)
    assert(r.groupBy("id").count().collect().forall(_.getLong(1) == 10))
  }

  test("a schema-evolving append breaks the run exactly there") {
    val store = new TableStore(spark, tmpDir("coal-evolve"))
    val df = (1 to 3).map(i => (i, s"v$i")).toDF("id", "v")
    store.create("t", df)
    store.append("t", df)
    store.append("t", (4 to 5).map(i => (i, s"v$i", i * 10)).toDF("id", "v", "w"))
    store.append("t", df)
    val r = store.read("t")
    // runs: [g1 g2] [g3] [g4] — the evolved group cannot merge with
    // either neighbor (different footer schema)
    assert(scanCount(r) == 3, s"expected 3 scans:\n${r.queryExecution.executedPlan}")
    assert(r.count() == 11)
    // evolved column: null for pre/post-evolution groups' rows
    assert(r.where(col("w").isNotNull).count() == 2)
    assert(r.columns.toSeq == Seq("id", "v", "w"))
  }

  test("a delete line between appends splits the run and deletes apply to the right groups") {
    val store = new TableStore(spark, tmpDir("coal-del"))
    val df = (1 to 4).map(i => (i, s"v$i")).toDF("id", "v")
    store.create("t", df)
    store.append("t", df)
    // delete id=1: applies to the two groups BEFORE it only
    store.appendWithDeletes("t", df.limit(0),
      deleteKeys = Seq(1).toDF("id"))
    store.append("t", df)
    store.append("t", df)
    val r = store.read("t")
    // [g1 g2] (delete applies) + [g4 g5] (no delete)
    assert(r.count() == 2 * 3 + 2 * 4)
    assert(r.where(col("id") === 1).count() == 2)
  }

  test("hive-partitioned tables keep per-group partition resolution and pruning") {
    val store = new TableStore(spark, tmpDir("coal-part"))
    val df = (1 to 8).map(i => (i, i % 2, s"v$i")).toDF("id", "p", "v")
    store.create("t", df, partitionBy = Seq("p"))
    store.append("t", df)
    val r = store.read("t")
    assert(r.count() == 16)
    assert(r.schema("p").dataType.typeName === "integer")
    assert(r.where(col("p") === 1).count() == 8)
  }

  test("coalesced reads stay stats-prunable per file") {
    val store = new TableStore(spark, tmpDir("coal-stats"))
    store.create("t", Seq((1, 10)).toDF("id", "x").coalesce(1))
    store.append("t", Seq((2, 20)).toDF("id", "x").coalesce(1))
    store.append("t", Seq((3, 30)).toDF("id", "x").coalesce(1))
    val pruned = store.read("t").where(col("x") >= 25)
    // sidecar stats must reject the two non-intersecting files inside
    // the ONE coalesced scan (scannedFiles runs the action; numFiles
    // is a first-execution metric, so it is read before any re-collect)
    assert(scannedFiles(pruned) == 1)
    assert(store.read("t").where(col("x") >= 25)
      .collect().map(_.getInt(0)).toSeq == Seq(3))
  }
}
