package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class MergeOnReadSpec extends SparkSpec {
  import spark.implicits._

  private def keys(df: DataFrame): Seq[String] =
    df.select("k").as[String].collect().toSeq.sorted

  test("appendWithDeletes upserts without rewriting any prior file") {
    val store = new TableStore(spark, tmpDir("mor"))
    store.create("t", Seq(("k1", 1), ("k2", 2), ("k3", 3)).toDF("k", "v"))
    val m0 = store.manifest("t", 0L)
    // upsert k2 (delete + reinsert in ONE commit), pure-delete k3
    store.appendWithDeletes("t",
      Seq(("k2", 20)).toDF("k", "v"),
      Seq("k2", "k3").toDF("k"))
    val m1 = store.manifest("t", store.currentVersion("t").get)
    // every original file carried verbatim — zero rewrite
    assert(m0.forall(m1.contains))
    assert(store.deleteDebt("t") == 1)
    val out = store.read("t").orderBy("k").as[(String, Int)].collect().toSeq
    assert(out == Seq(("k1", 1), ("k2", 20)))
    // time travel ignores later deletes
    assert(store.readVersion("t", 0L).count() == 3)
  }

  test("delete applies to prior commits only; later re-insert survives") {
    val store = new TableStore(spark, tmpDir("mor"))
    store.create("t", Seq(("k1", 1)).toDF("k", "v"))
    store.appendWithDeletes("t", Seq.empty[(String, Int)].toDF("k", "v"),
      Seq("k1").toDF("k"))
    assert(keys(store.read("t")) == Seq())
    // k1 comes back in a later commit — the old delete must not eat it
    store.appendWithDeletes("t", Seq(("k1", 9)).toDF("k", "v"),
      Seq("k1").toDF("k"))
    assert(store.read("t").as[(String, Int)].collect().toSeq == Seq(("k1", 9)))
  }

  test("compact folds delete debt and preserves the merged view") {
    val store = new TableStore(spark, tmpDir("mor"))
    store.create("t", Seq(("k1", 1), ("k2", 2)).toDF("k", "v"))
    store.appendWithDeletes("t", Seq(("k2", 20)).toDF("k", "v"),
      Seq("k2").toDF("k"))
    val before = store.read("t").orderBy("k").as[(String, Int)].collect().toSeq
    store.compact("t")
    assert(store.deleteDebt("t") == 0)
    assert(store.read("t").orderBy("k").as[(String, Int)].collect()
      .toSeq == before)
    // vacuum after compaction drops the now-unreferenced delete files
    store.vacuum("t", keep = 1)
    assert(store.read("t").orderBy("k").as[(String, Int)].collect()
      .toSeq == before)
  }

  test("CdcIngest mergeOnRead equals the legacy overwrite path") {
    def cdc(rows: (String, String, String)*): DataFrame =
      rows.toSeq.toDF("key", "ts_str", "op")
        .withColumn("process_date", col("ts_str").cast("timestamp"))
        .drop("ts_str")
    val b1 = Seq(
      ("k1", "2024-01-01 10:00:00", "I"),
      ("k2", "2024-01-01 11:00:00", "I"),
      ("k3", "2024-01-01 12:00:00", "I"))
    val b2 = Seq(
      ("k1", "2024-01-02 10:00:00", "U"),
      ("k2", "2024-01-02 11:00:00", "D"),
      ("k4", "2024-01-02 12:00:00", "I"))
    val mor = new TableStore(spark, tmpDir("mor"))
    val morCfg = CdcIngest.Config(mergeOnRead = true)
    CdcIngest.ingest(spark, mor, "t", cdc(b1: _*), morCfg)
    CdcIngest.ingest(spark, mor, "t", cdc(b2: _*), morCfg)
    val legacy = new TableStore(spark, tmpDir("mor"))
    CdcIngest.ingest(spark, legacy, "t", cdc(b1: _*))
    CdcIngest.ingest(spark, legacy, "t", cdc(b2: _*))
    val a = mor.read("t").select("key", "process_date")
      .orderBy("key").collect().toSeq
    val b = legacy.read("t").select("key", "process_date")
      .orderBy("key").collect().toSeq
    assert(a == b)
    assert(mor.deleteDebt("t") == 1)
    // watermark logic still sees the merged view: replay of b2 is a no-op
    assert(CdcIngest.ingest(spark, mor, "t", cdc(b2: _*), morCfg) ==
      CdcIngest.NoNewData)
  }
}
