package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.lake.{CdcIngest, TableStore}

/** Streaming ingestion mode (SURVEY §2.7/§7.6): the reference pipeline
  * is micro-batch-shaped (watermark = max(process_date), strictly-newer
  * filter), which maps 1:1 onto Structured Streaming `foreachBatch` —
  * each micro-batch flows through the SAME CdcIngest full/incremental
  * dispatch as the batch path, so semantics (dedup-keep-latest,
  * tombstone propagation, strict > watermark) are identical by
  * construction.
  *
  * Scale notes: the source is file-based (parquet dirs are how CDC
  * batches land in a lake); `maxFilesPerTrigger` bounds micro-batch
  * size; state is carried by the destination table itself (the
  * watermark re-derives from max(process_date)), so the query restarts
  * cleanly from any checkpoint.
  */
object StreamingIngest {

  /** Start a streaming CDC upsert from a parquet directory into
    * `store`/`table`. Caller stops the returned query. */
  def start(spark: SparkSession, sourceDir: String,
            store: TableStore, table: String,
            cfg: CdcIngest.Config = CdcIngest.Config(),
            checkpointDir: Option[String] = None,
            maxFilesPerTrigger: Int = 16,
            sourceSchema: Option[org.apache.spark.sql.types.StructType] = None,
            contract: Map[String, org.apache.spark.sql.types.DataType] = Map.empty): StreamingQuery = {
    // file streams need a schema up front; pass `sourceSchema` when the
    // landing dir may still be empty at start (the normal deploy order)
    val schema = sourceSchema.getOrElse(spark.read.parquet(sourceDir).schema)
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    val writer = stream.writeStream
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          // the same scan-boundary drift tolerance the batch path has
          // (Tables.contract). Scope: the file SOURCE reads with the
          // schema pinned at stream start, so this conforms a stream
          // (RE)STARTED over a drifted landing generation — a
          // mid-stream re-encode still needs a restart with the new
          // sourceSchema, after which downstream state/tables keep the
          // canonical types instead of breaking on the new encoding
          val conformed = graft.Tables.conformTo(batch, contract)
          CdcIngest.ingest(spark, store, table, conformed, cfg): Unit
        }
      }
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .start()
  }

  /** One CDC record in the stateful-dedup stream. */
  final case class KeyedRec(key: Long, ts: Long, op: String, value: Double)

  /** Stateful streaming dedup-keep-latest: per-key state holds the
    * current winner across micro-batches (flatMapGroupsWithState —
    * the custom-state operator for when watermark+window can't express
    * the semantics). Emits the key's latest non-tombstone record
    * whenever it changes. A tombstone (op=D) is KEPT in state (emitting
    * nothing): dropping it would let a late record older than the
    * delete resurrect the key, diverging from the batch
    * dedupLatest+dropTombstones result. Ties at the same ts prefer the
    * tombstone (deterministic, conservative); production streams should
    * carry a sequence/LSN column instead (see CdcIngest.Config.tiebreak).
    *
    * State grows with one record per live-or-deleted key; `stateTtl`
    * (a duration string, e.g. "30 days") bounds it with a
    * processing-time timeout, refreshed on every touch of the key.
    * The trade: once a key's state times out, a late record older
    * than its last version (including a tombstone) IS re-admitted —
    * the resurrection guard only holds within the TTL, which is why
    * it should exceed the source's maximum lateness. None = unbounded
    * state, exact semantics forever.
    */
  def statefulDedupLatest(records: org.apache.spark.sql.Dataset[KeyedRec],
                          stateTtl: Option[String] = None)
      : org.apache.spark.sql.Dataset[KeyedRec] = {
    import records.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val timeoutConf = if (stateTtl.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    records.groupByKey(_.key)
      .flatMapGroupsWithState[KeyedRec, KeyedRec](
        OutputMode.Update, timeoutConf) {
        (key: Long, batch: Iterator[KeyedRec], state: GroupState[KeyedRec]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val incoming = batch.toSeq
            if (incoming.isEmpty) Iterator.empty
            else {
              val candidates = state.getOption.toSeq ++ incoming
              // latest by ts; tombstone wins a ts tie
              val latest = candidates.maxBy(r => (r.ts, r.op == "D"))
              val out =
                if (state.getOption.contains(latest)) Iterator.empty
                else {
                  state.update(latest)
                  if (latest.op == "D") Iterator.empty
                  else Iterator.single(latest)
                }
              // refresh the clock on every touch (state exists here)
              stateTtl.foreach(state.setTimeoutDuration)
              out
            }
          }
      }
  }

  /** Streaming windowed aggregation with a watermark — the standard
    * streaming-analytics surface (event-time tumbling counts), exposed
    * for the `events` table shape. */
  def windowedCounts(events: DataFrame, tsCol: String, window: String,
                     watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))

  /** Stream-static enrichment: join each micro-batch against a STATIC
    * dimension, broadcast so the stream side never shuffles — the
    * standard streaming lookup join, and the only join shape that
    * holds when the stream is 100 TB/day and the dimension is a few
    * MB. Left outer: events with no dimension row carry NULL
    * enrichment instead of being dropped (a missing dim row must not
    * silently drop stream data). Works identically on bounded input,
    * which is how the spec pins stream == batch. */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
                    keys: Seq[String]): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim),
      keys, "left_outer")

  /** Watermarked stream-stream inner join — the two-live-streams shape
    * (impressions ⋈ clicks): equality on `key` plus an event-time
    * band `[0, within]` (right no earlier than left, at most `within`
    * after). BOTH sides carry watermarks and the time-band condition
    * bounds the join state Spark must buffer — without the band the
    * state grows without limit on unmatched keys. State is dropped as
    * the watermark passes; parallelism follows the key shuffle, the
    * standard streaming join contract. Works identically on bounded
    * input (modulo late data the watermark would drop), which is how
    * the spec pins stream == batch. */
  def streamStreamJoin(left: DataFrame, right: DataFrame, key: String,
                       leftTs: String, rightTs: String,
                       within: String, watermark: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $within"),
      "inner")
      .drop(r(key))
  }

  /** Gap-based session windows per key — the streaming form of the
    * batch lag+running-sum sessionization (EventQueries.sessionize):
    * `session_window` merges events closer than `gap` into one
    * growing window, closed by the watermark. Works identically on
    * bounded input, which is how the spec pins it to the batch
    * operator's session boundaries. */
  def sessionCounts(events: DataFrame, keyCol: String, tsCol: String,
                    gap: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("n_events"))
}
