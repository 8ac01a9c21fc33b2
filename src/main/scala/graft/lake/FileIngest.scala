package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** COPY INTO — idempotent, exactly-once FILE ingest (the Databricks
  * COPY INTO / Auto Loader batch shape, Iceberg's add_files cousin):
  * load a directory's files into a table such that re-running the
  * same command loads each file AT MOST ONCE, including under
  * concurrent runs.
  *
  * Mechanism: a per-table ledger table (`<table>_ingest_ledger`)
  * records every ingested file path; a run loads only files absent
  * from the ledger, and the DATA append and the LEDGER append publish
  * in ONE cross-table transaction. The ledger commit is
  * SNAPSHOT-CHECKED against the version the run read
  * ([[TableStore.appendIfUnchanged]]; table CREATE for a first run),
  * so two overlapping runs cannot both record the same files — the
  * loser aborts with [[SnapshotConflictException]], its whole
  * transaction (data included) unwinds, and a retry recomputes
  * against the new ledger and no-ops. Re-running after success is a
  * no-op. The residual window is a CRASH between the transaction's
  * two pointer swings (data published, ledger not — every
  * transaction commit documents this window): the retry would reload
  * that batch; failures, the common case, unwind fully.
  *
  * Scale: listing is O(files) driver-side metadata (every COPY INTO
  * implementation pays it); the load itself reads ONLY the fresh
  * files — a daily drop into a 100 TB table costs the day's files,
  * never a rescan. The ledger is O(total files ingested) — tiny
  * strings — and reads once per run. */
object FileIngest {

  final case class Result(filesLoaded: Int, rowsLoaded: Long)

  /** Ledger table name for `table`. */
  def ledgerOf(table: String): String = s"${table}_ingest_ledger"

  /** Load every not-yet-ingested data file under `srcPath` (a file or
    * a directory, recursively; `_`/`.`-prefixed entries skipped — the
    * same convention as the store's own listing) into `table`.
    * Creates the table (and ledger) on first run. Returns how many
    * files and rows this run actually loaded. */
  def copyInto(spark: SparkSession, store: TableStore, table: String,
               srcPath: String, format: String = "parquet"): Result = {
    import spark.implicits._
    val root = new Path(srcPath)
    val conf = spark.sessionState.newHadoopConf()
    require(root.getFileSystem(conf).exists(root),
      s"COPY INTO source $srcPath does not exist")
    val files = FsListing.dataFiles(root, conf)
    val ledger = ledgerOf(table)
    // pin the ledger snapshot the decision is made from — the commit
    // below must abort if another run recorded files in between
    val ledgerRs = store.currentVersion(ledger)
    val seen = ledgerRs
      .map(v => store.readVersion(ledger, v).select("file")
        .as[String].collect().toSet)
      .getOrElse(Set.empty[String])
    val fresh = files.filterNot(seen)
    if (fresh.isEmpty) return Result(0, 0L)
    val df = spark.read.format(format).load(fresh: _*)
    val n = df.count() // fresh files only — the price of an exact report
    val ownTxn = store.beginTransactionIfNone()
    try {
      store.append(table, df)
      val entries = fresh.toDF("file")
        .withColumn("ingested_at", current_timestamp())
      ledgerRs match {
        case Some(v) => store.appendIfUnchanged(ledger, entries, v)
        // first run: CREATE is itself the conflict check — a racing
        // first run loses the create claim and aborts loudly
        case None => store.create(ledger, entries)
      }
      if (ownTxn) store.commitTransaction()
    } catch { case t: Throwable =>
      if (ownTxn && store.inTransaction) store.rollbackTransaction()
      throw t
    }
    Result(fresh.size, n)
  }
}
