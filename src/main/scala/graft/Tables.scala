package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

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

  /** S1: catalog scan with schema-merge semantics. The engine-internal
    * contract is `events.ts` = epoch-nanos LongType; fixtures have shipped
    * it as parquet TIMESTAMP(NANOS) (no native Spark type — read as long
    * via the legacy flag) and as TIMESTAMP(MICROS) LTZ/NTZ. Normalize all
    * encodings at this scan boundary (see [[normalizeEventTime]]) so every
    * downstream `ts div 1000` works unmodified — schema-on-read tolerance,
    * the same coercion posture as the reference's dynamic frames
    * (icberg/iceberg_tables.py:103 string→timestamp).
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw =
      spark.read.option("mergeSchema", "true").parquet(s"$sfDir/$name.parquet")
    // epoch-nanos normalization is the EVENTS contract only: a future
    // table with a timestamp `ts` meant to stay a timestamp must not
    // be silently rewritten to long
    if (name == "events") normalizeEventTime(raw) else raw
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
