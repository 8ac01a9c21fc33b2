package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.types._

/** Table registry over the driver-generated parquet fixtures.
  *
  * Mirrors the reference's Glue-catalog source resolution
  * (icberg/iceberg_tables.py:54-58 `get_source_table`) as a
  * (name -> path) registry plus a schema-merging parquet reader
  * (additional_options mergeSchema=true, icberg/iceberg_tables.py:23).
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** S1: catalog scan with schema-merge semantics, conformed to the
    * per-table schema [[contract]] — any drifted physical encoding of a
    * contract column (int width, float32/64, decimal, NANOS/LTZ/NTZ/date/
    * string timestamps) is cast back to canonical at this one boundary,
    * so every downstream call site is encoding-independent.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sfDir/$name.parquet"
    // mergeSchema inference launches a distributed footer-merge job
    // per call, and a bench run loads the same read-only fixture
    // hundreds of times — cache the merged schema on the file's
    // (path, length, mtime) identity and supply it explicitly (a
    // supplied schema skips inference; rows still come from parquet
    // on every action). A rewritten fixture (drift tests re-encode in
    // place) changes length/mtime and misses the cache.
    val f = new java.io.File(path)
    val key = graft.lake.SchemaCache.keyOf(Seq(
      s"$path#${f.length}#${f.lastModified}"))
    val schema = graft.lake.SchemaCache.getOrInfer(key) {
      spark.read.option("mergeSchema", "true").parquet(path).schema
    }
    val raw = spark.read.schema(schema).parquet(path)
    conform(raw, name)
  }

  /** Canonical logical type per (table, column) — the engine-internal
    * schema contract. Fixture regeneration has twice shipped the same
    * logical column under a different physical encoding (round 5:
    * `events.ts` as NANOS/LTZ/NTZ); this registry makes the tolerance
    * total: any drifted-but-convertible encoding of a contract column
    * (int width, float32/64, decimal, date/ntz/string timestamps) is
    * cast back to the canonical type at the scan boundary, mirroring
    * the reference's schema-on-read posture (icberg/iceberg_tables.py:23
    * mergeSchema dynamic frames; :103 implicit string→timestamp).
    * Columns NOT in the contract pass through untouched (mergeSchema
    * may legitimately add new ones). */
  val contract: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Map("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampType, "o_orderpriority" -> StringType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampType),
    // events.ts canonical is epoch-nanos LONG (the engine contract every
    // `ts div 1000` call site assumes) — NOT a timestamp type.
    "events" -> Map("event_id" -> LongType, "ts" -> LongType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  /** Microseconds since epoch of an NTZ-typed SQL expression,
    * interpreting the wall clock as UTC — session-timezone independent,
    * matching DuckDB's `epoch_us` on naive timestamps. Takes SQL text
    * because `timestampdiff` has no DSL form (the unit is an identifier). */
  private def ntzMicros(sqlExpr: String): Column =
    expr(s"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', $sqlExpr)")

  /** Structural type equality ignoring nullability (array<float> vs
    * array<float> NOT NULL is not drift). */
  private def sameType(a: DataType, b: DataType): Boolean = (a, b) match {
    case (ArrayType(ae, _), ArrayType(be, _)) => sameType(ae, be)
    case _ => a == b
  }

  /** Cast one drifted column back to its canonical type. Timestamp
    * flavors convert via explicit epoch arithmetic (never a bare cast,
    * which is session-timezone dependent); everything else is a plain
    * Spark cast (int widths, float32/64, decimal→double, string→number).
    * Takes the column NAME (not a Column) because the nanos path needs
    * SQL integral `div` — a double division would lose precision above
    * 2^53, i.e. for any epoch-nanos value after 1970. */
  private def conformColumn(name: String, from: DataType, to: DataType): Column = {
    val c = col(name)
    (from, to) match {
      // canonical epoch-nanos long (events.ts) from any timestamp flavor
      case (TimestampType, LongType)    => unix_micros(c) * lit(1000L)
      case (TimestampNTZType, LongType) => ntzMicros(s"`$name`") * lit(1000L)
      case (DateType, LongType)         => unix_date(c).cast(LongType) * lit(86400000000000L)
      case (StringType, LongType)       =>
        // a stringly-typed long is either digits or a stringly-typed
        // timestamp (the §7.7.1 coercion-trap class): try the numeric
        // reading first, else parse as naive wall clock in UTC
        coalesce(
          expr(s"try_cast(`$name` as bigint)"),
          ntzMicros(s"try_cast(`$name` as timestamp_ntz)") * lit(1000L))
      // canonical timestamp from drifted encodings; a LONG physical under
      // the nanosAsLong flag can only mean parquet TIMESTAMP(NANOS)
      case (LongType, TimestampType)         => expr(s"timestamp_micros(`$name` div 1000)")
      case (TimestampNTZType, TimestampType) => timestamp_micros(ntzMicros(s"`$name`"))
      case (DateType, TimestampType)         => timestamp_micros(unix_date(c).cast(LongType) * lit(86400000000L))
      case (StringType, TimestampType)       =>
        // parse as a naive wall clock, then interpret as UTC
        timestamp_micros(ntzMicros(s"try_cast(`$name` as timestamp_ntz)"))
      case _ => c.cast(to)
    }
  }

  /** Conform a raw scan to the table's schema contract: cast every
    * drifted contract column to canonical, preserve column order, pass
    * through non-contract columns. No-op (same DataFrame, no projection
    * node) when nothing drifted — the common case costs nothing. */
  def conform(df: DataFrame, table: String): DataFrame =
    contract.get(table).map(conformTo(df, _)).getOrElse(df)

  /** [[conform]] against an arbitrary declared contract — the reusable
    * form for non-fixture scan boundaries (streaming landing dirs,
    * external DDL): any drifted-but-convertible encoding of a contract
    * column casts back to canonical; other columns pass through. */
  def conformTo(df: DataFrame, canon: Map[String, org.apache.spark.sql.types.DataType]): DataFrame = {
    // sameType ignores nullability (array<float> vs array<float> NOT
    // NULL is not drift) so the common case stays projection-free
    val drifted = df.schema.fields.exists(f =>
      canon.get(f.name).exists(t => !sameType(t, f.dataType)))
    if (!drifted) df
    else df.select(df.schema.fields.map { f =>
      canon.get(f.name) match {
        case Some(t) if !sameType(t, f.dataType) =>
          conformColumn(f.name, f.dataType, t).as(f.name)
        case _ => col(f.name)
      }
    }.toIndexedSeq: _*)
  }

  /** Rewrite a Timestamp/TimestampNTZ `ts` column to epoch-nanos LongType
    * in place (column order preserved); pass through long-typed `ts`
    * (TIMESTAMP(NANOS) fixtures under the legacy flag) and frames without
    * `ts`. NTZ wall-clock is interpreted as UTC via `timestampdiff`
    * against the NTZ epoch — session-timezone independent, matching
    * DuckDB's `epoch_us` on naive timestamps. */
  def normalizeEventTime(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", expr(
          "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000"))
      case _ => df
    }
  }

  /** S10: temp-view registration (icberg/iceberg_tables.py:69-70). */
  def view(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = load(spark, sfDir, name)
    df.createOrReplaceTempView(name)
    df
  }

  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(view(spark, sfDir, _))

  /** events.ts (epoch nanos long) -> TimestampType at microsecond
    * precision, truncating exactly like DuckDB's ns->us cast. Uses
    * integral `div` — a double division would lose precision above 2^53. */
  def nsToTimestamp(colName: String): Column =
    expr(s"timestamp_micros($colName div 1000)")
}
