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
