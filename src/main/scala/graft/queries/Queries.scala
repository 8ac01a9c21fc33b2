package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.ops.Cdc

/** Named query registry: every operator from SURVEY.md §2 (+ extensions)
  * as a (SparkSession, sfDir) => DataFrame, with equivalent ANSI SQL for
  * the DuckDB oracle where expressible.
  *
  * Determinism rules (SURVEY §5): every query ends in a total-order
  * ORDER BY; window ranks carry full tiebreak keys; UTC timezone;
  * doubles that aggregate are rounded.
  */
object Queries {
  type QFn = (SparkSession, String) => DataFrame

  /** A registered query. `oracleFn` is evaluated when the oracle map
    * is dumped — AFTER Verify has run every query — so an oracle may
    * embed values the query derived from the data at runtime (e.g.
    * trained k-means centroids as literals, the dynamic extension of
    * the seeded-LSH-plane trick). Most entries pass a static
    * Option[String]. */
  final case class Entry(name: String, fn: QFn, oracleFn: () => Option[String])

  object Entry {
    def apply(name: String, fn: QFn, oracle: Option[String]): Entry =
      new Entry(name, fn, () => oracle)
  }

  private[queries] def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Scratch dirs for queries' throwaway stores, reaped in one JVM
    * shutdown hook — a full Verify/Bench run creates hundreds of
    * them, and leaving them in /tmp across runs is a disk leak (the
    * result DataFrames read lazily AFTER the query function returns,
    * so in-query deletion is not an option). */
  private val scratchDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val reaper: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      scratchDirs.forEach { p =>
        try {
          java.nio.file.Files.walk(p)
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
        } catch { case _: Throwable => () }
      }))
  }
  /** Root for scratch stores: `$SPARK_GRAFT_SCRATCH` if set, else a
    * RAM-backed tmpfs (`/dev/shm`) when one is writable, else the JVM
    * temp dir. The lifecycle queries write hundreds of small throwaway
    * commits per bench run; on a disk-backed /tmp those writes ride
    * the host's ext4 writeback/journal jitter, which measured as
    * BIMODAL per-query times (6–14 s for the same query, idle box,
    * identical code — round-14 A/B). tmpfs decouples the measured
    * computation from background writeback. Every query still computes
    * from the parquet inputs and executes its full commit protocol —
    * only the ephemeral intermediates' backing store changes; at scale
    * these tables live on S3/HDFS and the choice is moot. */
  private lazy val scratchRoot: java.nio.file.Path = {
    // tmpfs is RAM-capped (typically 50% of RAM): only use /dev/shm
    // when it has generous headroom for the run's scratch footprint,
    // otherwise a larger SF or a concurrent run can ENOSPC mid-query.
    // $SPARK_GRAFT_SCRATCH overrides unconditionally.
    def roomy(p: java.nio.file.Path): Boolean =
      try java.nio.file.Files.getFileStore(p).getUsableSpace >= (8L << 30)
      catch { case _: Throwable => false }
    val shm = java.nio.file.Paths.get("/dev/shm")
    val cand = sys.env.get("SPARK_GRAFT_SCRATCH")
      .map(java.nio.file.Paths.get(_)) ++
      Seq(shm).filter(roomy) ++
      Seq(java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")))
    cand.find(p => java.nio.file.Files.isDirectory(p) &&
      java.nio.file.Files.isWritable(p)).get
  }

  private[queries] def scratchDir(prefix: String): String = {
    reaper
    val p = java.nio.file.Files.createTempDirectory(scratchRoot, prefix)
    scratchDirs.add(p)
    p.toString
  }

  // ---------------------------------------------------------------------
  // CDC parity queries (SURVEY §2.2/§2.5: W1, P4, P5, P6; §2.3 J1)
  // ---------------------------------------------------------------------

  /** Shared oracle CTE: the CDC shape derived from `events`
    * (FIXTURES.md §CDC). ts handled as epoch nanos for exactness. */
  private val cdcCte =
    """WITH cdc AS (
      |  SELECT event_id % 100 AS key, event_id, event_type, value,
      |         epoch_us(ts) AS ts_us,
      |         CASE WHEN event_type = 'error' THEN 'D'
      |              WHEN event_type = 'signup' THEN 'I'
      |              ELSE 'U' END AS op
      |  FROM events)
      |""".stripMargin

  private def cdcFrame(s: SparkSession, dir: String): DataFrame =
    Cdc.derive(t(s, dir, "events"), k = 100)
      .select(col("key"), col("event_id"), col("event_type"), col("value"),
        expr("ts div 1000").as("ts_us"), col("op"))

  val cdcDedupLatest: Entry = Entry(
    "cdc_dedup_latest",
    (s, dir) => {
      val deduped = Cdc.dedupLatest(cdcFrame(s, dir), Seq("key"),
        Seq(col("ts_us").desc, col("event_id").desc))
      Cdc.dropTombstones(deduped)
        .select("key", "event_id", "event_type", "value", "ts_us", "op")
        .orderBy("key")
    },
    Some(cdcCte +
      """SELECT key, event_id, event_type, value, ts_us, op FROM (
        |  SELECT *, row_number() OVER (PARTITION BY key
        |            ORDER BY ts_us DESC, event_id DESC) AS row_num
        |  FROM cdc) a
        |WHERE row_num = 1 AND (op IS NULL OR op IN ('I','U'))
        |ORDER BY key""".stripMargin))

  /** Full-load path (icberg/iceberg_tables.py:90-112): floor-date filter
    * (string-vs-timestamp comparison trap §7.7.1), dedup, tombstone drop. */
  val cdcFullLoad: Entry = Entry(
    "cdc_full_load",
    (s, dir) => {
      val floorNs = java.sql.Timestamp.valueOf("1900-01-01 00:00:00")
        .toInstant.getEpochSecond * 1000000L
      val filtered = cdcFrame(s, dir).where(col("ts_us") > floorNs)
      Cdc.dropTombstones(Cdc.dedupLatest(filtered, Seq("key"),
          Seq(col("ts_us").desc, col("event_id").desc)))
        .select("key", "event_id", "value", "ts_us")
        .orderBy("key")
    },
    Some(cdcCte +
      """SELECT key, event_id, value, ts_us FROM (
        |  SELECT *, row_number() OVER (PARTITION BY key
        |            ORDER BY ts_us DESC, event_id DESC) AS row_num
        |  FROM cdc
        |  WHERE ts_us > epoch_us(TIMESTAMP '1900-01-01 00:00:00')) a
        |WHERE row_num = 1 AND (op IS NULL OR op IN ('I','U'))
        |ORDER BY key""".stripMargin))

  /** Trap §7.7.1 replicated LITERALLY: a crawler-typed STRING
    * `process_date` compared against a TIMESTAMP floor — Spark
    * implicitly coerces the string column to timestamp
    * (icberg/iceberg_tables.py:34,:103), and the dedup window orders on
    * the string itself (lexicographic == chronological for the
    * zero-padded format, exactly the property the reference relies
    * on). */
  val cdcFullLoadStringDate: Entry = Entry(
    "cdc_full_load_string_date",
    (s, dir) => {
      val cdc = cdcFrame(s, dir).withColumn("process_date",
        date_format(expr("timestamp_micros(ts_us)"),
          "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      val floor = java.sql.Timestamp.valueOf("1900-01-01 00:00:00")
      val filtered = cdc.where(col("process_date") > lit(floor))
      Cdc.dropTombstones(Cdc.dedupLatest(filtered, Seq("key"),
          Seq(col("process_date").desc, col("event_id").desc)))
        .select("key", "event_id", "process_date")
        .orderBy("key")
    },
    Some("""WITH cdc AS (
        |  SELECT event_id % 100 AS key, event_id,
        |         strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS process_date,
        |         CASE WHEN event_type = 'error' THEN 'D'
        |              WHEN event_type = 'signup' THEN 'I'
        |              ELSE 'U' END AS op
        |  FROM events)
        |SELECT key, event_id, process_date FROM (
        |  SELECT *, row_number() OVER (PARTITION BY key
        |            ORDER BY process_date DESC, event_id DESC) AS row_num
        |  FROM cdc
        |  WHERE CAST(process_date AS TIMESTAMP) > TIMESTAMP '1900-01-01 00:00:00') a
        |WHERE row_num = 1 AND (op IS NULL OR op IN ('I','U'))
        |ORDER BY key""".stripMargin))

  /** Incremental path (icberg/iceberg_tables.py:115-153) simulated in one
    * plan: destination = full load of the first half (by time midpoint),
    * updates = strictly-newer rows, dedup-keep-latest, MERGE-delete
    * (left-anti, J1) then append survivors (S8) minus tombstones. */
  val cdcIncrementalMerge: Entry = Entry(
    "cdc_incremental_merge",
    (s, dir) => {
      // no cache: read twice (once for the min/max scalar, once in the
      // main plan) — caching here leaked block-manager memory across
      // the long-lived bench session
      val cdc = cdcFrame(s, dir)
      val Array(mn, mx) = cdc.agg(min("ts_us"), max("ts_us"))
        .collect()(0) match { case r => Array(r.getLong(0), r.getLong(1)) }
      val cut = (mn + mx) / 2
      val ord = Seq(col("ts_us").desc, col("event_id").desc)
      val dest = Cdc.dropTombstones(
        Cdc.dedupLatest(cdc.where(col("ts_us") <= cut), Seq("key"), ord))
      val updates = Cdc.dedupLatest(
        cdc.where(col("ts_us") > cut), Seq("key"), ord)
      val afterDelete = dest.join(updates.select("key"), Seq("key"), "left_anti")
      val survivors = Cdc.dropTombstones(updates)
      afterDelete.select("key", "event_id", "value", "ts_us")
        .unionByName(survivors.select("key", "event_id", "value", "ts_us"))
        .orderBy("key")
    },
    Some(cdcCte +
      """, cut AS (
        |  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS c FROM events),
        |dest AS (
        |  SELECT key, event_id, value, ts_us FROM (
        |    SELECT *, row_number() OVER (PARTITION BY key
        |              ORDER BY ts_us DESC, event_id DESC) AS row_num
        |    FROM cdc WHERE ts_us <= (SELECT c FROM cut)) a
        |  WHERE row_num = 1 AND (op IS NULL OR op IN ('I','U'))),
        |updates AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY key
        |              ORDER BY ts_us DESC, event_id DESC) AS row_num
        |    FROM cdc WHERE ts_us > (SELECT c FROM cut)) a
        |  WHERE row_num = 1)
        |SELECT key, event_id, value, ts_us FROM dest
        |WHERE key NOT IN (SELECT key FROM updates)
        |UNION ALL
        |SELECT key, event_id, value, ts_us FROM updates
        |WHERE op IS NULL OR op IN ('I','U')
        |ORDER BY key""".stripMargin))

  /** The reference's literal mechanism: a driver-side SQL template
    * (load_sql_template, icberg/iceberg_tables.py:39-44) interpolated
    * and executed via spark.sql over temp views (S10). Same result as
    * cdc_dedup_latest through the SQL-text front door. */
  val cdcDedupSqlPath: Entry = Entry(
    "cdc_dedup_sql_template",
    (s, dir) => {
      cdcFrame(s, dir).createOrReplaceTempView("incremental_table")
      val pk = "key"
      val dateCol = "ts_us"
      val where = "a.row_num = 1 AND (a.op IS NULL OR a.op IN ('I','U'))"
      // Scala-interpolated template == the reference's .format(...) macro
      val sql =
        s"""SELECT key, event_id, event_type, value, ts_us, op FROM (
           |  SELECT *, row_number() OVER (PARTITION BY $pk
           |            ORDER BY $dateCol DESC, event_id DESC) AS row_num
           |  FROM incremental_table) a
           |WHERE $where ORDER BY $pk""".stripMargin
      s.sql(sql)
    },
    Some(cdcCte +
      """SELECT key, event_id, event_type, value, ts_us, op FROM (
        |  SELECT *, row_number() OVER (PARTITION BY key
        |            ORDER BY ts_us DESC, event_id DESC) AS row_num
        |  FROM cdc) a
        |WHERE row_num = 1 AND (op IS NULL OR op IN ('I','U'))
        |ORDER BY key""".stripMargin))

  /** A1/A2: global watermark aggregate (max process_date) —
    * icberg/iceberg_tables.py:131. */
  val cdcWatermark: Entry = Entry(
    "cdc_watermark_max",
    (s, dir) => t(s, dir, "events")
      .agg(expr("max(ts) div 1000").as("max_ts_us"), count(lit(1)).as("n")),
    Some("SELECT max(epoch_us(ts)) AS max_ts_us, count(*) AS n FROM events"))

  /** P1+P2: crawler-partition stripping after discovery by name —
    * icberg/iceberg_tables.py:84-87,:176-177. Proves the partition_*
    * columns are gone and data untouched. */
  val cdcStripPartitions: Entry = Entry(
    "cdc_strip_partitions",
    (s, dir) => {
      val cdc = Cdc.derive(t(s, dir, "events"), k = 100)
      val stripped = Cdc.removeColumns(cdc, Cdc.partitionCols(cdc))
      stripped.select(col("event_id"), col("key"), col("op"),
          expr("ts div 1000").as("ts_us"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, event_id % 100 AS key,
        |       CASE WHEN event_type = 'error' THEN 'D'
        |            WHEN event_type = 'signup' THEN 'I'
        |            ELSE 'U' END AS op,
        |       epoch_us(ts) AS ts_us
        |FROM events ORDER BY event_id""".stripMargin))

  // ---------------------------------------------------------------------
  // Star-schema breadth: scans, filters, joins, aggregations
  // ---------------------------------------------------------------------

  /** S1+P4: scan, filter (string-literal timestamp comparison), project,
    * pushed to parquet. */
  val scanFilterProject: Entry = Entry(
    "scan_filter_project",
    (s, dir) => t(s, dir, "lineitem")
      .where(col("l_shipdate") > lit("1997-06-15 00:00:00").cast("timestamp"))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        |FROM lineitem WHERE l_shipdate > TIMESTAMP '1997-06-15 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin))

  /** TPC-H Q1 shape: grouped aggregation with arithmetic (sum/avg/count). */
  val q1PricingSummary: Entry = Entry(
    "q1_pricing_summary",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  /** Multi-way join + group + top-k (TPC-H Q3 shape). Small dims are
    * broadcast automatically; explicit broadcast on customer. */
  val q3TopOrders: Entry = Entry(
    "q3_top_orders",
    (s, dir) => {
      val cust = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some("""SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin))

  /** J1 standalone: left-anti join (the MERGE-delete primitive). */
  val joinAnti: Entry = Entry(
    "join_anti_customers_no_orders",
    (s, dir) => t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin))

  // ---------------------------------------------------------------------
  // Registry
  // ---------------------------------------------------------------------
  /** C2 fallback (icberg/iceberg_tables.py:184-187): source without an
    * Op column — dedup keeps latest per key with NO tombstone predicate. */
  val cdcDedupNoOpCol: Entry = Entry(
    "cdc_dedup_noop_fallback",
    (s, dir) => {
      val cdc = Cdc.derive(t(s, dir, "events"), k = 100, withOp = false)
        .select(col("key"), col("event_id"), col("value"),
          expr("ts div 1000").as("ts_us"))
      assert(!Cdc.hasOpCol(cdc)) // the fallback branch is the one under test
      Cdc.dedupLatest(cdc, Seq("key"), Seq(col("ts_us").desc, col("event_id").desc))
        .orderBy("key")
    },
    Some("""SELECT key, event_id, value, ts_us FROM (
        |  SELECT event_id % 100 AS key, event_id, value, epoch_us(ts) AS ts_us,
        |         row_number() OVER (PARTITION BY event_id % 100
        |           ORDER BY epoch_us(ts) DESC, event_id DESC) AS row_num
        |  FROM events) a
        |WHERE row_num = 1 ORDER BY key""".stripMargin))

  /** SCD Type-2 dimension build ([[Cdc.scd2Build]]): the event stream
    * as a change log (key = user bucket, attribute = event type) turned
    * into versioned dimension rows — no-op changes dropped, each
    * version closed by the next one's change time, open-ended current
    * rows. Both windows share one key-partitioned exchange. */
  val scd2Dimension: Entry = Entry(
    "scd2_dimension_build",
    (s, dir) => {
      val ch = t(s, dir, "events")
        .select((col("user_id") % 50).as("key"), col("event_type"),
          expr("ts div 1000").as("ts_us"))
      Cdc.scd2Build(ch, Seq("key"), "ts_us", Seq("event_type"))
        .select("key", "event_type", "valid_from", "valid_to", "is_current")
        .orderBy("key", "valid_from", "event_type")
    },
    Some("""WITH ch AS (
        |  SELECT user_id % 50 AS key, event_type, epoch_us(ts) AS ts_us
        |  FROM events),
        |d AS (
        |  SELECT *, lag(event_type) OVER (
        |    PARTITION BY key ORDER BY ts_us, event_type) AS prev
        |  FROM ch),
        |vers AS (
        |  SELECT key, event_type, ts_us AS valid_from,
        |    lead(ts_us) OVER (PARTITION BY key
        |      ORDER BY ts_us, event_type) AS valid_to
        |  FROM d WHERE prev IS DISTINCT FROM event_type)
        |SELECT key, event_type, valid_from, valid_to,
        |  valid_to IS NULL AS is_current
        |FROM vers ORDER BY key, valid_from, event_type""".stripMargin))

  /** Approximate sketches, DETERMINISTIC edition: KMV distinct-count
    * (k smallest md5-derived hashes — [[graft.ops.Sketches]], engine-
    * independent unlike HLL's register layout) plus a histogram-bucket
    * median (unit-width price buckets, first bucket whose cumulative
    * count crosses half — the classic fixed-histogram percentile
    * sketch, equally deterministic in any engine). Both are honest
    * sketches — bounded state per group, mergeable map-side — AND
    * hash-checkable against the oracle, which HLL/approx_percentile
    * never were (this was the registry's one rows-only entry).
    * Scale: the histogram is ≤ price-domain buckets per group after
    * map-side combine; its window partitions by group over bucket
    * rows, never data rows. */
  val approxSketches: Entry = Entry(
    "approx_sketches_lineitem",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val est = graft.ops.Sketches
        .kmvDistinct(li, Seq("l_returnflag"), "l_orderkey", k = 64)
        .withColumnRenamed("est_distinct", "approx_orders")
      val hist = li
        .groupBy(col("l_returnflag"),
          floor(col("l_extendedprice")).cast("long").as("b"))
        .agg(count(lit(1)).as("c"))
      val cum = Window.partitionBy("l_returnflag").orderBy("b")
      val tot = Window.partitionBy("l_returnflag")
      val p50 = hist
        .withColumn("cumc", sum("c").over(cum))
        .withColumn("n", sum("c").over(tot))
        .where(col("cumc") * 2 >= col("n"))
        .groupBy("l_returnflag")
        .agg((min("b") + lit(0.5)).cast("double").as("approx_p50"))
      est.join(p50, Seq("l_returnflag")).orderBy("l_returnflag")
    },
    Some(s"""WITH h AS (
        |  SELECT DISTINCT l_returnflag, ${OracleSql.hex12ToBigint("hx")} AS h
        |  FROM (SELECT l_returnflag,
        |          md5(CAST(l_orderkey AS VARCHAR)) AS hx FROM lineitem)),
        |r AS (
        |  SELECT l_returnflag, h, row_number() OVER (
        |    PARTITION BY l_returnflag ORDER BY h) AS rn
        |  FROM h),
        |est AS (
        |  SELECT l_returnflag,
        |    CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
        |         ELSE round(63.0 * 281474976710656 / max(h), 4) END
        |      AS approx_orders
        |  FROM r WHERE rn <= 64 GROUP BY l_returnflag),
        |hist AS (
        |  SELECT l_returnflag, CAST(floor(l_extendedprice) AS BIGINT) AS b,
        |    count(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |cum AS (
        |  SELECT l_returnflag, b,
        |    sum(c) OVER (PARTITION BY l_returnflag ORDER BY b) AS cumc,
        |    sum(c) OVER (PARTITION BY l_returnflag) AS n
        |  FROM hist),
        |p AS (
        |  SELECT l_returnflag, CAST(min(b) + 0.5 AS DOUBLE) AS approx_p50
        |  FROM cum WHERE cumc * 2 >= n GROUP BY l_returnflag)
        |SELECT est.l_returnflag, approx_orders, approx_p50
        |FROM est JOIN p ON est.l_returnflag = p.l_returnflag
        |ORDER BY est.l_returnflag""".stripMargin))

  val entries: Seq[Entry] = Seq(
    cdcDedupLatest, cdcFullLoad, cdcFullLoadStringDate,
    cdcIncrementalMerge, cdcWatermark,
    cdcStripPartitions, cdcDedupSqlPath, cdcDedupNoOpCol, scd2Dimension,
    scanFilterProject,
    q1PricingSummary, q3TopOrders, joinAnti, approxSketches) ++
    StarQueries.entries ++ StarQueries2.entries ++ EventQueries.entries ++
    TextQueries.entries ++ VectorQueries.entries ++
    MultimodalQueries.entries ++ PipelineQueries.entries ++
    RetrievalQueries.entries ++ DynamicFrameQueries.entries ++
    Dsv2Queries.entries

  def queries: Map[String, QFn] =
    entries.map(e => e.name -> e.fn).toMap
  def oracleSql: Map[String, String] =
    entries.flatMap { e =>
      // a dynamic oracleFn (embedded runtime literals) that throws must
      // cost ONE query its oracle (driver falls back to rows-only), not
      // crash the whole dump and zero the round's correctness
      try e.oracleFn().map(e.name -> _)
      catch { case ex: Throwable =>
        System.err.println(
          s"[queries] oracle for ${e.name} failed: ${ex.getMessage}")
        None
      }
    }.toMap
}
