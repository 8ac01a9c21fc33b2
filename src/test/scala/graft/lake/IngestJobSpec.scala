package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IngestJobSpec extends SparkSpec {
  import spark.implicits._

  test("arg parsing matches the Glue job parameter shape") {
    val a = IngestJob.parseArgs(Array(
      "--src_path", "/in", "--store_root", "/lake",
      "--dest_table", "t", "--pk", "id", "--date_col", "pd"))
    assert(a == IngestJob.Args("/in", "/lake", "t", "id", "pd",
      "1900-01-01 00:00:00"))
    intercept[IllegalArgumentException] {
      IngestJob.parseArgs(Array("--src_path", "/in"))
    }
  }

  test("merge-strategy flags parse into the Config fields") {
    val a = IngestJob.parseArgs(Array(
      "--src_path", "/in", "--store_root", "/lake", "--dest_table", "t",
      "--tiebreak", "seq,lsn", "--bucket_format", "yyyy-MM",
      "--merge_on_read", "true"))
    assert(a.tiebreak == Seq("seq", "lsn"))
    assert(a.bucketFormat.contains("yyyy-MM"))
    assert(a.mergeOnRead)
  }

  test("job run with merge_on_read commits equality deletes") {
    val src = tmpDir("job-src")
    val lake = tmpDir("job-lake")
    def land(rows: (String, String, String)*): Unit =
      rows.toSeq.toDF("id", "ts_str", "op")
        .withColumn("pd", col("ts_str").cast("timestamp")).drop("ts_str")
        .coalesce(1).write.mode("overwrite").parquet(src)
    val args = IngestJob.Args(src, lake, "t", "id", "pd",
      "1900-01-01 00:00:00", mergeOnRead = true)
    land(("a", "2024-01-01 10:00:00", "I"), ("b", "2024-01-01 10:01:00", "I"))
    IngestJob.run(spark, args)
    land(("a", "2024-01-02 10:00:00", "D"), ("c", "2024-01-02 10:01:00", "I"))
    IngestJob.run(spark, args)
    val store = new TableStore(spark, lake)
    assert(store.read("t").select("id").as[String].collect().sorted
      .toSeq == Seq("b", "c"))
    assert(store.deleteDebt("t") == 1)
  }

  test("job run: full load then incremental over landed parquet batches") {
    val src = tmpDir("job-src")
    val lake = tmpDir("job-lake")
    def land(rows: (String, String, String)*): Unit =
      rows.toSeq.toDF("id", "ts_str", "op")
        .withColumn("pd", col("ts_str").cast("timestamp")).drop("ts_str")
        .withColumn("partition_0", lit("2024"))
        .coalesce(1).write.mode("overwrite").parquet(src)
    val args = IngestJob.Args(src, lake, "t", "id", "pd", "1900-01-01 00:00:00")

    land(("a", "2024-01-01 10:00:00", "I"), ("b", "2024-01-01 10:01:00", "I"))
    assert(IngestJob.run(spark, args) == CdcIngest.FullLoad)

    land(("a", "2024-01-02 10:00:00", "D"), ("c", "2024-01-02 10:01:00", "I"))
    assert(IngestJob.run(spark, args) == CdcIngest.IncrementalLoad(2))

    val store = new TableStore(spark, lake)
    val out = store.read("t")
    assert(out.select("id").as[String].collect().sorted.toSeq == Seq("b", "c"))
    assert(!out.columns.exists(_.contains("partition_")))
  }
}
