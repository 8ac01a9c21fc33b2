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

  /** S1: catalog scan with schema-merge semantics. `events.ts` is parquet
    * TIMESTAMP(NANOS) which Spark has no native type for — read it as
    * epoch-nanos LongType (legacy flag) and convert in queries that need a
    * timestamp. DuckDB parity: `epoch_ns(ts)` yields the identical long.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.option("mergeSchema", "true").parquet(s"$sfDir/$name.parquet")
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
