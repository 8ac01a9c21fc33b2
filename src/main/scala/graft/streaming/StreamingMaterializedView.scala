package graft.streaming

import graft.lake.{MaterializedView, TableStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingest that keeps a materialized view CONTINUOUSLY
  * fresh: each micro-batch appends to the source table and folds the
  * resulting change feed into every bound view, inside one
  * foreachBatch. Exactly-once composes from the two existing
  * watermarks — the batch-id app-txn on the SOURCE append (a replayed
  * micro-batch no-ops, same discipline as [[StreamingVectorIndex]])
  * and the mv-sync watermark on the VIEW (a refresh of an
  * already-folded source version no-ops) — so a crash between the
  * append and the refresh re-delivers the batch, the append no-ops,
  * and the refresh completes the fold; nothing double-counts.
  *
  * This is the composition the batch pieces were designed for: the
  * view is O(changed data) behind the stream at every trigger, and a
  * missed refresh (crash, slow trigger) self-heals on the next one —
  * the feed nets everything committed since the view's bound version.
  */
object StreamingMaterializedView {

  private def appId(table: String) = s"mv-stream-$table"

  /** Start streaming parquet arrivals from `sourceDir` into `table`,
    * refreshing `views` (each a materialized view bound to `table`)
    * after every appended batch. `checkpointDir` is REQUIRED and must
    * be durable — the batch-id watermark is only sound under a stable
    * checkpoint (see [[StreamingVectorIndex.startIngest]]'s caveat;
    * the same loud batch-id-regression guard applies through
    * TableStore's txn machinery). Caller stops the returned query. */
  def start(spark: SparkSession, sourceDir: String,
            store: TableStore, table: String, views: Seq[String],
            checkpointDir: String,
            sourceSchema: Option[org.apache.spark.sql.types.StructType] = None,
            maxFilesPerTrigger: Int = 16): StreamingQuery = {
    require(store.exists(table), s"table $table does not exist")
    require(checkpointDir.nonEmpty,
      "checkpointDir must be a durable location: without a stable " +
        "checkpoint, restarted batch ids restart at 0 and the " +
        "exactly-once watermark would silently DROP new batches")
    val schema = sourceSchema.getOrElse(spark.read.parquet(sourceDir).schema)
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
      .writeStream
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(store, table, views, batch, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
  }

  /** One micro-batch: exactly-once append to the source (batch-id
    * watermark; replays no-op), then refresh each view from the
    * change feed. The refresh runs OUTSIDE the append's replay guard
    * on purpose: a crash after the append but before the refresh
    * re-delivers the batch as a no-op append, and the refresh here
    * still folds the feed the first delivery committed. Public for
    * callers wiring their own foreachBatch. */
  def ingestBatch(store: TableStore, table: String, views: Seq[String],
                  batch: DataFrame, batchId: Long): Unit = {
    val wm = store.lastTxn(table, appId(table))
    if (wm.forall(_ < batchId) && !batch.isEmpty)
      store.appendTxn(table, batch, appId(table), batchId)
    views.foreach(v => MaterializedView.refresh(store, v))
  }
}
