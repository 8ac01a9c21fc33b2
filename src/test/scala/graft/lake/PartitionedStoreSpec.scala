package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PartitionedStoreSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned create lays out hive-style dirs and prunes on read") {
    val store = new TableStore(spark, tmpDir("pstore"))
    val df = Seq(
      (1, "2024-01", "a"), (2, "2024-01", "b"),
      (3, "2024-02", "c"), (4, "2024-03", "d"))
      .toDF("id", "month", "v")
    store.create("t", df, partitionBy = Seq("month"))
    assert(store.partitioning("t") == Seq("month"))

    val pruned = store.read("t").where(col("month") === "2024-01")
    assert(pruned.select("id").as[Int].collect().sorted.toSeq == Seq(1, 2))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(month"),
      s"no partition pruning:\n$plan")
  }

  test("overwritePartitions carries untouched partition files by reference") {
    val store = new TableStore(spark, tmpDir("pstore"))
    store.create("t", Seq(
      (1, "2024-01", "a"), (2, "2024-02", "b"), (3, "2024-03", "c"))
      .toDF("id", "month", "v"), partitionBy = Seq("month"))
    val v0 = store.currentVersion("t").get
    val m0 = store.manifest("t", v0)

    // replace 2024-02, empty out 2024-03 entirely (no rows for it)
    store.overwritePartitions("t",
      Seq((20, "2024-02", "B")).toDF("id", "month", "v"),
      touched = Seq("month=2024-02", "month=2024-03"))

    val v1 = store.currentVersion("t").get
    val m1 = store.manifest("t", v1)
    val untouched0 = m0.filter(_.contains("month=2024-01"))
    assert(untouched0.nonEmpty)
    // untouched partition: the SAME file paths, carried not rewritten
    assert(m1.filter(_.contains("month=2024-01")) == untouched0)
    // touched partition: none of the old files survive
    assert(m1.filter(_.contains("month=2024-02"))
      .forall(!m0.contains(_)))
    // fully-deleted partition: gone from the manifest
    assert(!m1.exists(_.contains("month=2024-03")))
    assert(store.read("t").select("id").as[Int].collect().sorted
      .toSeq == Seq(1, 20))
    // time travel still sees the pre-merge version
    assert(store.readVersion("t", v0).count() == 3)
  }

  test("overwritePartitions rejects rows outside the declared partitions") {
    val store = new TableStore(spark, tmpDir("pstore"))
    store.create("t", Seq((1, "2024-01")).toDF("id", "month"),
      partitionBy = Seq("month"))
    val e = intercept[IllegalArgumentException] {
      store.overwritePartitions("t",
        Seq((2, "2024-02")).toDF("id", "month"), touched = Seq("month=2024-01"))
    }
    assert(e.getMessage.contains("outside"))
    // the failed commit left no new version behind
    assert(store.currentVersion("t").get == 0L)
  }

  test("append preserves the partition layout") {
    val store = new TableStore(spark, tmpDir("pstore"))
    store.create("t", Seq((1, "2024-01")).toDF("id", "month"),
      partitionBy = Seq("month"))
    store.append("t", Seq((2, "2024-02")).toDF("id", "month"))
    assert(store.read("t").select("id").as[Int].collect().sorted
      .toSeq == Seq(1, 2))
    // the new snapshot keeps hive-style month= dirs
    val v1 = new java.io.File(
      store.read("t").inputFiles.head).getParentFile
    assert(v1.getName.startsWith("month="), s"got ${v1.getName}")
  }
}
