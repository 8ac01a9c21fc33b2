package graft

import graft.lake.{CdcIngest, GraftSql, TableStore}
import graft.ops.{Dedup, VectorIndex}
import org.apache.spark.sql.functions._

/** The README "Quickstart" snippets, verbatim — this spec is the
  * compile-and-run guarantee behind them. Keep the two in sync: a
  * snippet edited here must be edited there and vice versa. */
class QuickstartSmokeSpec extends SparkSpec {
  import spark.implicits._

  test("quickstart: versioned tables (TableStore)") {
    val store = new TableStore(spark, tmpDir("qs-tables"))
    store.create("users", Seq((1L, "ada"), (2L, "grace")).toDF("id", "name"))
    store.append("users", Seq((3L, "edsger")).toDF("id", "name"))
    // upsert without rewriting a file: merge-on-read delete + reinsert
    store.appendWithDeletes("users",
      Seq((2L, "grace h.")).toDF("id", "name"), Seq(2L).toDF("id"))
    assert(store.read("users").count() == 3)             // current state
    assert(store.readVersion("users", 0L).count() == 2)  // time travel
    store.compact("users")                                // fold MoR debt
    store.vacuum("users", keep = 2)                       // retention
  }

  test("quickstart: CDC upserts (CdcIngest)") {
    val store = new TableStore(spark, tmpDir("qs-cdc"))
    val batch = Seq(
      ("I", 1L, "a", "2024-01-01 10:00:00"),
      ("U", 1L, "a-v2", "2024-01-02 10:00:00"),
      ("D", 2L, "b", "2024-01-02 11:00:00"))
      .toDF("Op", "id", "v", "process_date")
      .withColumn("process_date", col("process_date").cast("timestamp"))
    CdcIngest.ingest(spark, store, "dim", batch,
      CdcIngest.Config(primaryKey = "id", dateCol = "process_date"))
    // keep-latest per key, tombstones dropped; re-ingesting the same
    // batch is a watermark-guarded no-op
    assert(store.read("dim").select("v").as[String].collect()
      .toSeq == Seq("a-v2"))
  }

  test("quickstart: SQL front door (GraftSql)") {
    val store = new TableStore(spark, tmpDir("qs-sql"))
    Seq((1L, "x"), (2L, "y")).toDF("id", "v").createOrReplaceTempView("src")
    GraftSql.execute(spark, store, "CREATE TABLE t AS SELECT * FROM src")
    GraftSql.execute(spark, store, "INSERT INTO t VALUES (3, 'z')")
    GraftSql.execute(spark, store, "UPDATE t SET v = 'y2' WHERE id = 2")
    GraftSql.execute(spark, store,
      "MERGE INTO t USING src s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    val was = GraftSql.execute(spark, store, "SELECT * FROM t VERSION AS OF 0")
    GraftSql.execute(spark, store, "OPTIMIZE t")
    // a bare SELECT resolves the store table at the CURRENT manifest
    val now = GraftSql.execute(spark, store, "SELECT * FROM t")
    assert(store.read("t").count() == 3 && was.count() == 2
      && now.count() == 3)
  }

  test("quickstart: incremental materialized views (MaterializedView)") {
    val store = new TableStore(spark, tmpDir("qs-mv"))
    Seq((1L, "x"), (2L, "y")).toDF("id", "v").createOrReplaceTempView("srcv")
    GraftSql.execute(spark, store, "CREATE TABLE t AS SELECT * FROM srcv")
    GraftSql.execute(spark, store, "CREATE MATERIALIZED VIEW t_mv AS " +
      "SELECT v, count(*), sum(id) FROM t GROUP BY v")
    GraftSql.execute(spark, store, "INSERT INTO t VALUES (9, 'x')")
    GraftSql.execute(spark, store, "DELETE FROM t WHERE id = 1")
    GraftSql.execute(spark, store, "REFRESH MATERIALIZED VIEW t_mv")
    val rows = GraftSql.execute(spark, store, // consolidated rows, O(view)
      "SELECT v, cnt, sum_id FROM t_mv ORDER BY v")
      .as[(String, Long, Long)].collect().toSeq
    assert(rows == Seq(("x", 1L, 9L), ("y", 1L, 2L)))
    GraftSql.execute(spark, store, "OPTIMIZE MATERIALIZED VIEW t_mv")
    assert(store.read("t_mv").count() == 2)
  }

  test("quickstart: LLM data ops (dedup + persisted ANN)") {
    val store = new TableStore(spark, tmpDir("qs-llm"))
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog at night"),
      (3L, "an entirely different document about spark and parquet"))
      .toDF("doc_id", "text")
    // near-duplicate candidate pairs via MinHash-LSH (banded, never
    // all-pairs), then exact-Jaccard verify on the candidates only
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text")
    assert(cands.collect().map(r => (r.getLong(0), r.getLong(1)))
      .contains((1L, 2L)))
    // persisted IVF ANN: build once (attributes ride into the lists),
    // then filtered top-k, O(batch) appends, and delete propagation
    val emb = (0L until 60L).map(i => (i, Array.tabulate(8)(d =>
      (i % 3) * 10f + d * 0.1f), (i % 3).toInt)).toDF(
      "vec_id", "embedding", "label")
    VectorIndex.buildIvfIndex(store, "ix", emb, nlist = 4,
      kmeansIters = 1, attrCols = Seq("label"))
    val hits = VectorIndex.searchIvfIndexFiltered(store, "ix",
      emb.where(col("vec_id") === 0L), k = 5, nprobe = 2,
      filter = col("label") === 0)
    assert(hits.count() == 5)
    VectorIndex.deleteFromIvfIndex(store, "ix",
      emb.where(col("vec_id") === 3L))
    assert(VectorIndex.searchIvfIndex(store, "ix",
        emb.where(col("vec_id") === 0L), k = 50, nprobe = 4)
      .where(col("vid") === 3L).isEmpty)
  }

  test("quickstart: vanilla-Spark access (DSv2 catalog + row-level SQL)") {
    val root = tmpDir("qs-dsv2")
    val store = new TableStore(spark, root)
    store.create("t", Seq((1L, "x"), (2L, "y")).toDF("id", "v"))
    // path or root+table reader; MoR deletes, renames, stats/bloom file
    // skipping and time travel all apply
    assert(spark.read.format("graft").load(s"$root/t").count() == 2)
    assert(spark.read.format("graft").option("versionAsOf", "0")
      .load(s"$root/t").count() == 2)
    // or register a catalog once and use plain SQL
    spark.conf.set("spark.sql.catalog.g", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.g.root", root)
    spark.sql("SELECT v, count(*) FROM g.t GROUP BY v").collect()
    spark.sql("SELECT * FROM g.t VERSION AS OF 0").collect()
    spark.sql("INSERT INTO g.t VALUES (9, 'q')")     // a store commit
    spark.sql("CREATE TABLE g.t2 AS SELECT * FROM g.t WHERE id > 1")
    // row-level SQL (sessions built with
    // spark.sql.extensions=graft.functions.GraftExtensions)
    Seq((2L, "y2"), (7L, "new")).toDF("id", "v")
      .createOrReplaceTempView("updates")
    spark.sql("MERGE INTO g.t AS t USING updates AS u ON t.id = u.id " +
      "WHEN MATCHED THEN UPDATE SET v = u.v " +
      "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (u.id, u.v)")
    spark.sql("UPDATE g.t SET v = 'z' WHERE id = 9")
    spark.sql("DELETE FROM g.t WHERE id = 1")
    // schema evolution: metadata-only commit, old rows backfill NULL
    spark.sql("ALTER TABLE g.t ADD COLUMNS (score DOUBLE)")
    val got = spark.sql("SELECT id, v, score FROM g.t ORDER BY id")
      .as[(Long, String, Option[Double])].collect().toSeq
    assert(got == Seq((2L, "y2", None), (7L, "new", None),
      (9L, "z", None)), s"got $got")
    assert(store.exists("t2"))
    // maintenance as stored procedures (Spark 4 CALL — the Iceberg idiom)
    spark.sql("CALL g.system.optimize(table => 't')").collect()
    spark.sql("CALL g.system.vacuum(table => 't', retain_versions => 2)")
      .collect()
    assert(store.versions("t").size == 2)
    // Structured Streaming both ways: offsets ARE table versions;
    // the sink lands one exactly-once atomic commit per micro-batch
    store.create("t_copy", store.read("t").limit(0))
    val ckpt = tmpDir("qs-dsv2-ckpt")
    val q = spark.readStream.format("graft")
      .option("root", root).option("table", "t").load()
      .writeStream.format("graft")
      .option("root", root).option("table", "t_copy")
      .option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    assert(store.read("t_copy").count() == store.read("t").count())
  }

  test("quickstart: the index follows its corpus table (CDF sync)") {
    val store = new TableStore(spark, tmpDir("qs-sync"))
    val emb = (0L until 60L).map(i => (i, Array.tabulate(8)(d =>
      (i % 3) * 10f + d * 0.1f))).toDF("vec_id", "embedding")
    store.create("corpus", emb.where(col("vec_id") < 40))
    // bind the index to the corpus version it saw at build time...
    VectorIndex.buildIvfIndexFromTable(store, "ix", "corpus",
      nlist = 4, kmeansIters = 1)
    // ...let the table evolve through normal commits...
    store.append("corpus", emb.where(col("vec_id") >= 40))
    store.deleteWhere("corpus", col("vec_id") === 7L)
    // ...then one call applies the change feed: atomic, exactly-once,
    // O(changed data) — the index never serves a purged id again
    VectorIndex.syncIvfIndex(store, "ix", "corpus")
    val ids = store.read(VectorIndex.listsTable("ix"))
      .select("vec_id").as[Long].collect().toSet
    assert(ids == (0L until 60L).toSet - 7L)
  }
}
