package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import Queries.{Entry, t}

/** Event-stream-shaped queries over `events`: JSON props extraction,
  * time-bucketed aggregation, gap-based sessionization. These are the
  * batch equivalents of the Structured Streaming mode (SURVEY §2.7) —
  * same windowing semantics, bounded input.
  *
  * `ts` arrives as epoch-nanos long (see Tables.load); `ts div 1000`
  * (micros) is the DuckDB-exact currency.
  */
object EventQueries {

  /** Semi-structured JSON column: extract + aggregate
    * (from_json/get_json_object per SURVEY §7.4). */
  val jsonExtract: Entry = Entry(
    "json_props_extract",
    (s, dir) => t(s, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type"),
    Some("""SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Tumbling-window aggregation (hourly) — the batch form of a
    * streaming `groupBy(window($"ts", "1 hour"))`. */
  val hourlyAgg: Entry = Entry(
    "events_hourly_agg",
    (s, dir) => t(s, dir, "events")
      .select(date_trunc("hour", Tables.nsToTimestamp("ts")).as("hour"),
        col("event_type"), col("value"))
      .groupBy("hour", "event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .orderBy("hour", "event_type"),
    Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
        |  event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY hour, event_type
        |ORDER BY hour, event_type""".stripMargin))

  /** Gap-based sessionization (30-min inactivity): lag -> new-session
    * flag -> running sum = session id -> per-session aggregate. The
    * session-window operator a training-data pipeline needs; maps to
    * `session_window` / flatMapGroupsWithState in streaming mode. */
  val sessionize: Entry = Entry(
    "events_sessionize",
    (s, dir) => {
      val gapUs = 30L * 60 * 1000000
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts_us"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000").as("ts_us"))
        .withColumn("prev_us", lag("ts_us", 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
        .withColumn("sess_id", sum("new_sess").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sess_id")
        .agg(count(lit(1)).as("n_events"),
          min("ts_us").as("start_us"), max("ts_us").as("end_us"))
        .orderBy("user_id", "sess_id")
    },
    Some("""WITH x AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
        |        ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events),
        |y AS (
        |  SELECT *, CASE WHEN prev_us IS NULL
        |        OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM x),
        |z AS (
        |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        |  FROM y)
        |SELECT user_id, sess_id, count(*) AS n_events,
        |  min(ts_us) AS start_us, max(ts_us) AS end_us
        |FROM z GROUP BY user_id, sess_id ORDER BY user_id, sess_id""".stripMargin))

  /** Pivot-style conditional aggregation (event-type counts as columns). */
  val pivotCounts: Entry = Entry(
    "events_pivot_type_counts",
    (s, dir) => t(s, dir, "events")
      .groupBy("user_id")
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("clicks"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("views"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchases"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("errors"))
      .orderBy("user_id"),
    Some("""SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin))

  val entries: Seq[Entry] = Seq(jsonExtract, hourlyAgg, sessionize, pivotCounts)
}
