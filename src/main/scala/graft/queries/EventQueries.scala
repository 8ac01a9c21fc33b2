package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.ops.{AsofJoin, RangeJoin}
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

  /** The same semi-structured extraction through Spark 4's VARIANT
    * type: `parse_json` once into the binary variant encoding, then
    * typed `variant_get` paths — the scale path for JSON-heavy
    * columns (parse once, no per-access string re-parse, and shredded
    * storage pushdown when written). `try_variant_get` on a missing
    * path must yield NULL for every row, pinning the null-safety
    * contract; the oracle replays the algebra over DuckDB's JSON
    * functions — same answers, different encoding. */
  val variantExtract: Entry = Entry(
    "variant_props_extract",
    (s, dir) => t(s, dir, "events")
      .select(col("event_type"), parse_json(col("props")).as("v"))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'long')").as("k"),
        expr("try_variant_get(v, '$.missing', 'long')").as("m"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("k").as("sum_k"),
        countDistinct("k").as("distinct_k"),
        round(avg("k"), 4).as("avg_k"),
        count("m").as("n_missing_hits"))
      .orderBy("event_type"),
    Some("""SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS distinct_k,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
        |  count(CAST(json_extract_string(props, '$.missing') AS BIGINT)) AS n_missing_hits
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

  /** Batch pin of the streaming windowed-counts surface: runs the
    * SAME `StreamingIngest.windowedCounts` operator (watermarked
    * event-time tumbling aggregation) on the bounded events table —
    * the watermark node is eliminated on batch input, leaving exactly
    * the windowed aggregation a running stream computes per window.
    * With the oracle row checked here and StreamingIngestSpec
    * asserting stream == batch on the same input, the streaming
    * surface is transitively oracle-pinned. */
  val windowedCountsBatch: Entry = Entry(
    "streaming_windowed_counts_batch",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(Tables.nsToTimestamp("ts").as("ts_t"),
          col("event_type"), col("value"))
      graft.streaming.StreamingIngest
        .windowedCounts(ev, "ts_t", "1 hour", "2 hours")
        .select(col("window.start").as("hour"), col("event_type"),
          col("n"), round(col("sum_value"), 4).as("sum_value"))
        .orderBy("hour", "event_type")
    },
    Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
        |  event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY hour, event_type
        |ORDER BY hour, event_type""".stripMargin))

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

  /** Forward + nearest as-of joins ([[AsofJoin.forward]]/[[AsofJoin.nearest]],
    * the full pandas/polars `merge_asof` direction surface): each click
    * carries the user's previous view, next view (forward-INCLUSIVE at
    * equal ts), and the nearest view within a 1-hour tolerance with
    * its direction (ties → backward). All three run the union-window
    * plan — one key shuffle each, no join operator. The oracle
    * reproduces the same with min/max windows over one tagged union;
    * forward inclusivity falls out of `prev = ts ⇒ next = ts`. */
  val asofForwardNearest: Entry = Entry(
    "asof_join_forward_nearest",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), expr("ts div 1000").as("ts_us"),
          col("event_id"))
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), expr("ts div 1000").as("vts")).distinct()
      val tol = 3600000000L // 1 hour in micros
      val b = AsofJoin.backward(clicks, views, Seq("user_id"),
          "ts_us", "vts", Nil)
        .withColumnRenamed("vts", "prev_view_us")
      val f = AsofJoin.forward(b, views, Seq("user_id"),
          "ts_us", "vts", Nil)
        .withColumnRenamed("vts", "next_view_us")
      AsofJoin.nearest(f, views, Seq("user_id"),
          "ts_us", "vts", Nil, toleranceUs = Some(tol))
        .withColumnRenamed("vts", "near_view_us")
        .select("user_id", "ts_us", "event_id", "prev_view_us",
          "next_view_us", "near_view_us", "asof_dir")
        .orderBy("event_id")
    },
    Some("""WITH c AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id
        |  FROM events WHERE event_type = 'click'),
        |v AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) AS vts
        |  FROM events WHERE event_type = 'view'),
        |u AS (
        |  SELECT user_id, ts_us, 1 AS side, NULL AS vts, event_id FROM c
        |  UNION ALL
        |  SELECT user_id, vts, 0, vts, NULL FROM v),
        |w AS (
        |  SELECT user_id, ts_us, side, event_id,
        |    max(vts) OVER (PARTITION BY user_id ORDER BY ts_us, side
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS prev_view_us,
        |    min(vts) OVER (PARTITION BY user_id ORDER BY ts_us, side
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_x
        |  FROM u),
        |m AS (
        |  SELECT user_id, ts_us, event_id, prev_view_us,
        |    CASE WHEN prev_view_us = ts_us THEN ts_us ELSE next_x END
        |      AS next_view_us
        |  FROM w WHERE side = 1),
        |n AS (
        |  SELECT *,
        |    (prev_view_us IS NOT NULL
        |      AND ts_us - prev_view_us <= 3600000000) AS b_ok,
        |    (next_view_us IS NOT NULL
        |      AND next_view_us - ts_us <= 3600000000) AS f_ok
        |  FROM m)
        |SELECT user_id, ts_us, event_id, prev_view_us, next_view_us,
        |  CASE WHEN b_ok AND (NOT f_ok
        |           OR ts_us - prev_view_us <= next_view_us - ts_us)
        |         THEN prev_view_us
        |       WHEN f_ok THEN next_view_us END AS near_view_us,
        |  CASE WHEN b_ok AND (NOT f_ok
        |           OR ts_us - prev_view_us <= next_view_us - ts_us)
        |         THEN 'backward'
        |       WHEN f_ok THEN 'forward' END AS asof_dir
        |FROM n ORDER BY event_id""".stripMargin))

  /** As-of join: each click event picks up the user's most recent view
    * at-or-before it (the point-in-time feature lookup). Views are
    * pre-aggregated to one row per (user, ts) so the match is
    * deterministic; the engine path is the union-window formulation —
    * no join operator in the plan (asserted in PlanSpec). Oracle:
    * DuckDB's native ASOF LEFT JOIN. */
  val asofLastView: Entry = Entry(
    "asof_join_last_view",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), expr("ts div 1000").as("ts_us"),
          col("event_id"))
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), expr("ts div 1000").as("view_us"),
          col("value"))
        .groupBy("user_id", "view_us")
        .agg(round(max("value"), 4).as("view_value"))
      AsofJoin.backward(clicks, views, keys = Seq("user_id"),
          leftTs = "ts_us", rightTs = "view_us",
          rightCols = Seq("view_value"))
        .orderBy("event_id")
    },
    Some("""WITH clicks AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id
        |  FROM events WHERE event_type = 'click'),
        |views AS (
        |  SELECT user_id, epoch_us(ts) AS view_us,
        |         round(max(value), 4) AS view_value
        |  FROM events WHERE event_type = 'view'
        |  GROUP BY user_id, epoch_us(ts))
        |SELECT c.user_id, c.ts_us, c.event_id, v.view_us, v.view_value
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND c.ts_us >= v.view_us
        |ORDER BY event_id""".stripMargin))

  /** Range join: overlapping time windows × events via bucketed
    * equi-join (never a theta join). 20 windows of width 2×step tile
    * [min, max] with 50% overlap, so most events land in two windows.
    * Step arithmetic is integral in both engines for exact parity. */
  val rangeJoinWindows: Entry = Entry(
    "range_join_windows",
    (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val Array(mnUs, mxUs) = ev
        .agg(expr("min(ts) div 1000"), expr("max(ts) div 1000"))
        .collect()(0) match { case r => Array(r.getLong(0), r.getLong(1)) }
      // clamp: a degenerate fixture span under 20 us would make the
      // bucket width 0 (the oracle's window arithmetic also uses the
      // clamped value, so parity holds)
      val step = math.max((mxUs - mnUs) / 20, 1L)
      val intervals = (0 until 20).map(i =>
        (i.toLong, mnUs + i * step, mnUs + i * step + 2 * step))
        .toDF("interval_id", "s_us", "e_us")
      val points = ev.select(expr("ts div 1000").as("p_us"), col("value"))
      RangeJoin.pointInInterval(points, intervals,
          pCol = "p_us", startCol = "s_us", endCol = "e_us",
          bucketWidth = step)
        .groupBy("interval_id")
        .agg(count(lit(1)).as("n"),
          round(sum("value"), 4).as("sum_value"))
        .orderBy("interval_id")
    },
    Some("""WITH b AS (
        |  SELECT min(epoch_us(ts)) AS mn,
        |         greatest((max(epoch_us(ts)) - min(epoch_us(ts))) // 20, 1) AS step
        |  FROM events),
        |iv AS (
        |  SELECT i AS interval_id, mn + i * step AS s_us,
        |         mn + i * step + 2 * step AS e_us
        |  FROM b, (SELECT unnest(range(20)) AS i)),
        |p AS (SELECT epoch_us(ts) AS p_us, value FROM events)
        |SELECT interval_id, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM iv JOIN p ON p_us >= s_us AND p_us < e_us
        |GROUP BY interval_id ORDER BY interval_id""".stripMargin))

  /** Time-series resample: per-user hourly grid over the stream's
    * span, value forward-filled from the most recent event at or
    * before each bucket ([[graft.ops.Resample.ffillGrid]] — grid
    * explode + union-window as-of, one key shuffle, no join
    * operator). Output profiles the grid per bucket: how many
    * user-slots are filled and the filled total — deterministic at
    * any partitioning (ties per (user, ts) resolve to max(value)). */
  val resampleFfill: Entry = Entry(
    "events_resample_hourly_ffill",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("value"))
      // empty input => null aggregates; a degenerate one-bucket grid
      // over zero keys yields the correct empty result
      val bounds = ev.agg(min("ts_us"), max("ts_us")).collect()(0)
      val (mn, mx) =
        if (bounds.isNullAt(0)) (0L, 0L)
        else (bounds.getLong(0), bounds.getLong(1))
      val hourUs = 3600000000L
      val filled = graft.ops.Resample.ffillGrid(ev, Seq("user_id"),
        "ts_us", "value", hourUs, mn - mn % hourUs, mx - mx % hourUs)
      filled.groupBy("bucket_us")
        .agg(count(col("value")).as("n_filled"),
          round(sum("value"), 2).as("sum_value"))
        .orderBy("bucket_us")
    },
    Some("""WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
        |ded AS (
        |  SELECT user_id, ts_us, max(value) AS value
        |  FROM ev GROUP BY user_id, ts_us),
        |b AS (
        |  SELECT min(ts_us) - min(ts_us) % 3600000000 AS t0,
        |         max(ts_us) - max(ts_us) % 3600000000 AS t1 FROM ev),
        |grid AS (
        |  SELECT u.user_id, g.bucket_us
        |  FROM (SELECT DISTINCT user_id FROM ev) u CROSS JOIN
        |       (SELECT unnest(range(t0, t1 + 1, 3600000000)) AS bucket_us
        |        FROM b) g),
        |j AS (
        |  SELECT g.user_id, g.bucket_us, d.value
        |  FROM grid g ASOF LEFT JOIN ded d
        |    ON g.user_id = d.user_id AND g.bucket_us >= d.ts_us)
        |SELECT bucket_us, count(value) AS n_filled,
        |       round(sum(value), 2) AS sum_value
        |FROM j GROUP BY bucket_us ORDER BY bucket_us""".stripMargin))

  /** Keyed interval-overlap join (ops/IntervalJoin): per-order ship
    * spans derived from lineitem, self-joined per customer on span
    * intersection — "which of a customer's orders were in flight at
    * the same time". The join is an equi-join on the customer key
    * with the overlap predicate as a residual (no theta join; the
    * per-key fan-in bounds the pair count). Output aggregates to one
    * row per customer with overlapping orders. */
  val intervalJoinKeyed: Entry = Entry(
    "interval_join_keyed",
    (s, dir) => {
      val spans = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("ck"), col("l_orderkey").as("ok"))
        .agg(min("l_shipdate").as("sd"), max("l_shipdate").as("ed"))
      graft.ops.IntervalJoin
        .selfOverlapPairs(spans, Seq("ck"), "ok", "sd", "ed")
        .groupBy(col("ck").as("c_custkey"))
        .agg(count(lit(1)).as("n_pairs"),
          max(datediff(col("overlap_end"), col("overlap_start")))
            .as("max_olap_days"))
        .orderBy("c_custkey")
    },
    Some("""WITH spans AS (
        |  SELECT o_custkey AS ck, l_orderkey AS ok,
        |         min(l_shipdate) AS sd, max(l_shipdate) AS ed
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY o_custkey, l_orderkey)
        |SELECT a.ck AS c_custkey, count(*) AS n_pairs,
        |  max(date_diff('day', CAST(greatest(a.sd, b.sd) AS DATE),
        |                 CAST(least(a.ed, b.ed) AS DATE))) AS max_olap_days
        |FROM spans a JOIN spans b
        |  ON a.ck = b.ck AND a.ok < b.ok AND a.sd <= b.ed AND b.sd <= a.ed
        |GROUP BY a.ck ORDER BY a.ck""".stripMargin))

  /** Batch pin for the watermarked stream-stream join
    * ([[graft.streaming.StreamingIngest.streamStreamJoin]]): views ⋈
    * clicks per user with clicks in [view, view + 2h] — the SAME
    * operator the StreamingIngestSpec drives with two live
    * MemoryStreams, run on bounded input so DuckDB can oracle the
    * time-band join algebra. */
  val streamJoinBatch: Entry = Entry(
    "streaming_stream_join_batch",
    (s, dir) => {
      val ev = t(s, dir, "events")
      def side(tpe: String, tsName: String) = ev
        .where(col("event_type") === tpe)
        .select(col("user_id"),
          timestamp_micros(expr("ts div 1000")).as(tsName))
      graft.streaming.StreamingIngest.streamStreamJoin(
          side("view", "view_ts"), side("click", "click_ts"),
          "user_id", "view_ts", "click_ts", "2 hours", "1 hour")
        .select(col("user_id"),
          unix_micros(col("view_ts")).as("view_us"),
          unix_micros(col("click_ts")).as("click_us"))
        .orderBy("user_id", "view_us", "click_us")
    },
    Some("""WITH v AS (
        |  SELECT user_id, epoch_us(ts) AS vt FROM events
        |  WHERE event_type = 'view'),
        |c AS (
        |  SELECT user_id, epoch_us(ts) AS ct FROM events
        |  WHERE event_type = 'click')
        |SELECT v.user_id AS user_id, vt AS view_us, ct AS click_us
        |FROM v JOIN c ON v.user_id = c.user_id
        |  AND ct >= vt AND ct <= vt + 7200000000
        |ORDER BY user_id, view_us, click_us""".stripMargin))

  /** Ordered funnel (view → click → purchase): per user, the earliest
    * view, the earliest click AFTER that view, the earliest purchase
    * AFTER that click — strict event-order semantics, not mere
    * presence. Three staged per-user aggregates, each a keyed shuffle
    * joined BACK on the user key (broadcast-sized after stage 1 in
    * practice); no window ever spans more than one user. Output is the
    * per-stage user counts — the conversion report. */
  val funnelConversion: Entry = Entry(
    "funnel_conversion",
    (s, dir) => {
      // microsecond precision on BOTH sides: DuckDB reads the ns
      // timestamps at us precision, and a strict > on raw nanos could
      // order two same-microsecond events differently
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          expr("ts div 1000").as("ts"))
      def firstAfter(tpe: String, prev: DataFrame, prevTs: String,
                     outTs: String): DataFrame =
        ev.where(col("event_type") === tpe)
          .join(prev, "user_id")
          .where(col("ts") > col(prevTs))
          .groupBy("user_id", prevTs)
          .agg(min("ts").as(outTs))
      val v = ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("tv"))
      val c = firstAfter("click", v, "tv", "tc")
      val p = firstAfter("purchase", c.select("user_id", "tc"), "tc", "tp")
      v.select(lit(1).as("stage"), lit("view").as("step"), col("user_id"))
        .unionByName(c.select(lit(2).as("stage"), lit("click").as("step"),
          col("user_id")))
        .unionByName(p.select(lit(3).as("stage"), lit("purchase").as("step"),
          col("user_id")))
        .groupBy("stage", "step")
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("stage")
    },
    Some("""WITH v AS (
        |  SELECT user_id, min(epoch_us(ts)) AS tv FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, v.tv, min(epoch_us(e.ts)) AS tc
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.tv
        |  GROUP BY e.user_id, v.tv),
        |p AS (
        |  SELECT e.user_id, c.tc, min(epoch_us(e.ts)) AS tp
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.tc
        |  GROUP BY e.user_id, c.tc)
        |SELECT stage, step, n_users FROM (
        |  SELECT 1 AS stage, 'view' AS step,
        |         count(DISTINCT user_id) AS n_users FROM v
        |  UNION ALL
        |  SELECT 2, 'click', count(DISTINCT user_id) FROM c
        |  UNION ALL
        |  SELECT 3, 'purchase', count(DISTINCT user_id) FROM p)
        |ORDER BY stage""".stripMargin))

  /** Weekly cohort retention: users cohorted by first-seen week, then
    * distinct active users per (cohort, week offset) — the standard
    * retention triangle. Two keyed shuffles (first-seen per user,
    * distinct per cohort cell); offsets derive from integral epoch
    * arithmetic so both engines bucket weeks identically. */
  val cohortRetention: Entry = Entry(
    "cohort_retention",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), expr("ts div 1000").as("ts_us"))
        // integral div — a double division of ~1e15 epoch micros can
        // truncate to the wrong week at bucket boundaries
        .withColumn("wk", expr("ts_us div 604800000000"))
      val first = ev.groupBy("user_id").agg(min("wk").as("cohort_wk"))
      ev.join(first, "user_id")
        .where(col("wk") - col("cohort_wk") <= 3)
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("offset"))
        .agg(countDistinct("user_id").as("n_active"))
        .orderBy("cohort_wk", "offset")
    },
    Some("""WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
        |first AS (
        |  SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY user_id)
        |SELECT cohort_wk, ev.wk - cohort_wk AS "offset",
        |       count(DISTINCT ev.user_id) AS n_active
        |FROM ev JOIN first ON ev.user_id = first.user_id
        |WHERE ev.wk - cohort_wk <= 3
        |GROUP BY cohort_wk, ev.wk - cohort_wk
        |ORDER BY cohort_wk, "offset"""".stripMargin))

  val entries: Seq[Entry] = Seq(jsonExtract, variantExtract, hourlyAgg,
    sessionize, pivotCounts, asofLastView, asofForwardNearest,
    rangeJoinWindows,
    resampleFfill, windowedCountsBatch, intervalJoinKeyed, streamJoinBatch,
    funnelConversion, cohortRetention)
}
