package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** COPY INTO — idempotent, exactly-once FILE ingest (the Databricks
  * COPY INTO / Auto Loader batch shape, Iceberg's add_files cousin):
  * load a directory's files into a table such that re-running the
  * same command loads each file AT MOST ONCE, across crashes.
  *
  * Mechanism: a per-table ledger table (`<table>_ingest_ledger`)
  * records every ingested file path; a run loads only files absent
  * from the ledger, and the DATA append and the LEDGER append publish
  * in ONE cross-table transaction — so a crash can never leave a file
  * loaded but unrecorded (double-load on retry) or recorded but
  * unloaded (silent loss). Re-running after success is a no-op.
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
    * a directory, recursively; `_`/`.`-prefixed entries skipped) into
    * `table`. Creates the table (and ledger) on first run. Returns
    * how many files and rows this run actually loaded. */
  def copyInto(spark: SparkSession, store: TableStore, table: String,
               srcPath: String, format: String = "parquet"): Result = {
    import spark.implicits._
    val root = new Path(srcPath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(root), s"COPY INTO source $srcPath does not exist")
    val files = {
      val it = fs.listFiles(root, true)
      val buf = Seq.newBuilder[String]
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        if (st.isFile && !name.startsWith("_") && !name.startsWith("."))
          buf += st.getPath.toString
      }
      buf.result().sorted
    }
    val ledger = ledgerOf(table)
    val seen =
      if (store.exists(ledger))
        store.read(ledger).select("file").as[String].collect().toSet
      else Set.empty[String]
    val fresh = files.filterNot(seen)
    if (fresh.isEmpty) return Result(0, 0L)
    val df = spark.read.format(format).load(fresh: _*)
    val n = df.count() // fresh files only — the price of an exact report
    val ownTxn = !store.inTransaction
    if (ownTxn) store.beginTransaction()
    try {
      store.append(table, df)
      store.append(ledger, fresh.toDF("file")
        .withColumn("ingested_at", current_timestamp()))
      if (ownTxn) store.commitTransaction()
    } catch { case t: Throwable =>
      if (ownTxn && store.inTransaction) store.rollbackTransaction()
      throw t
    }
    Result(fresh.size, n)
  }
}
