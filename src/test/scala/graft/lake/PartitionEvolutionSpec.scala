package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Partition evolution (Iceberg default-spec style): `setPartitioning`
  * switches the layout NEW commits write under, as a metadata commit —
  * old files stay under their old dirs and every era keeps reading
  * correctly because the per-commit-group basePath read resolves each
  * group's own dirs, union-by-name aligning the eras. */
class PartitionEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def mk(tag: String) = new TableStore(spark, tmpDir(tag))

  test("evolved layout: both eras read back whole, new files under new dirs") {
    val store = mk("pevo")
    store.create("t", Seq(
      (1, "2024-01", "us", "a"), (2, "2024-02", "eu", "b"))
      .toDF("id", "month", "region", "v"), partitionBy = Seq("month"))
    store.setPartitioning("t", Seq("region"))
    assert(store.partitioning("t") == Seq("region"))
    store.append("t", Seq((3, "2024-02", "us", "c")).toDF("id", "month", "region", "v"))

    // every era's rows come back with BOTH columns populated: month is
    // a dir for era 1 / file data for era 2, region the reverse
    val got = store.read("t").select("id", "month", "region", "v")
      .as[(Int, String, String, String)].collect().toSet
    assert(got == Set((1, "2024-01", "us", "a"), (2, "2024-02", "eu", "b"),
      (3, "2024-02", "us", "c")))
    // the new commit's files physically sit under region= dirs
    val newFiles = store.manifest("t", store.currentVersion("t").get)
      .filterNot(store.manifest("t", 0L).toSet)
    assert(newFiles.nonEmpty && newFiles.forall(_.contains("region=us")))
    // partition pruning works for the new layout on the new era's files
    assert(store.read("t").where(col("region") === "eu")
      .select("id").as[Int].collect().toSeq == Seq(2))

    // the evolution published a content-identical metadata version:
    // history shows it, time travel to the pre-evolution version works
    assert(store.versions("t") == Seq(0L, 1L, 2L))
    assert(store.readVersion("t", 0L).count() == 2)
    FeedLaws.telescopes(store, "t", 0L, 2L)
  }

  test("compact folds every era into the current layout") {
    val store = mk("pevo")
    store.create("t", Seq((1, "2024-01", "x", "a")).toDF("id", "month", "q", "v"),
      partitionBy = Seq("month"))
    store.setPartitioning("t", Seq("q"))
    store.append("t", Seq((2, "2024-02", "y", "b")).toDF("id", "month", "q", "v"))
    store.compact("t")
    val files = store.manifest("t", store.currentVersion("t").get)
    assert(files.forall(_.contains("q=")), s"not folded: $files")
    assert(store.read("t").count() == 2)
  }

  test("partition-scoped overwrite refuses mixed eras, works after folding") {
    val store = mk("pevo")
    store.create("t", Seq((1, "2024-01", "x", "a")).toDF("id", "month", "q", "v"),
      partitionBy = Seq("month"))
    store.setPartitioning("t", Seq("q"))
    store.append("t", Seq((2, "2024-02", "y", "b")).toDF("id", "month", "q", "v"))
    val e = intercept[IllegalArgumentException] {
      store.overwritePartitions("t",
        Seq((20, "2024-02", "y", "B")).toDF("id", "month", "q", "v"),
        touched = Seq("q=y"))
    }
    assert(e.getMessage.contains("earlier partition layout"))
    store.compact("t")
    store.overwritePartitions("t",
      Seq((20, "2024-02", "y", "B")).toDF("id", "month", "q", "v"),
      touched = Seq("q=y"))
    assert(store.read("t").select("id").as[Int].collect().sorted
      .toSeq == Seq(1, 20))
  }

  test("evolution to unpartitioned, and guards") {
    val store = mk("pevo")
    store.create("t", Seq((1, "2024-01", "a")).toDF("id", "month", "v"),
      partitionBy = Seq("month"))
    store.setPartitioning("t", Nil)
    assert(store.partitioning("t").isEmpty)
    store.append("t", Seq((2, "2024-02", "b")).toDF("id", "month", "v"))
    assert(store.read("t").count() == 2)

    // unknown column
    assert(intercept[IllegalArgumentException] {
      store.setPartitioning("t", Seq("nope"))
    }.getMessage.contains("no column nope"))
    // duplicate columns
    assert(intercept[IllegalArgumentException] {
      store.setPartitioning("t", Seq("month", "MONTH"))
    }.getMessage.contains("duplicate"))
    // renamed column: dirs would store the current name, files the
    // physical one
    store.renameColumn("t", "v", "val")
    assert(intercept[IllegalArgumentException] {
      store.setPartitioning("t", Seq("val"))
    }.getMessage.contains("renamed"))
    // a failed evolution never burned the layout or wedged the table
    assert(store.partitioning("t").isEmpty)
    store.append("t", Seq((3, "2024-03", "c")).toDF("id", "month", "val"))
    assert(store.read("t").count() == 3)
  }

  test("SQL front door: ALTER TABLE SET PARTITIONED BY") {
    val store = mk("pevo")
    store.create("t", Seq((1, "2024-01", "us", "a"))
      .toDF("id", "month", "region", "v"), partitionBy = Seq("month"))
    val d = GraftSql.execute(spark, store,
      "ALTER TABLE t SET PARTITIONED BY (region, month)")
    assert(d.head().getAs[scala.collection.Seq[String]]("partition_columns")
      .toSeq == Seq("region", "month"))
    store.append("t", Seq((2, "2024-02", "eu", "b"))
      .toDF("id", "month", "region", "v"))
    val newFiles = store.manifest("t", store.currentVersion("t").get)
      .filterNot(store.manifest("t", 0L).toSet)
    assert(newFiles.forall(_.contains("region=eu/month=2024-02")))
  }
}
