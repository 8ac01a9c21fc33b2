package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** (database, table) -> path registry standing in for the AWS Glue Data
  * Catalog (icberg/iceberg_tables.py:21-22,55-57) plus the Athena
  * external-table registration (delta/delta_tables.py:41-47,59-72 →
  * session-catalog DDL, S9 — control-plane only, no data movement).
  */
final class Catalog(spark: SparkSession) {
  private val paths = TrieMap.empty[(String, String), String]

  def register(db: String, table: String, path: String): Unit =
    paths.update((db, table), path)

  def pathOf(db: String, table: String): Option[String] = paths.get((db, table))

  /** S1: resolve + scan with schema-merge (get_source_table). */
  def read(db: String, table: String): DataFrame = {
    val p = paths.getOrElse((db, table),
      throw new IllegalArgumentException(s"unknown table $db.$table"))
    spark.read.option("mergeSchema", "true").parquet(p)
  }

  /** S9: external-table DDL against the session catalog — the Spark
    * equivalent of the reference's Athena CREATE EXTERNAL TABLE. */
  def registerExternal(name: String, path: String): Unit =
    spark.sql(s"CREATE TABLE IF NOT EXISTS `$name` USING parquet LOCATION '$path'")

  /** S10: temp-view hand-off between DataFrame and SQL stages. */
  def registerView(name: String, df: DataFrame): Unit =
    df.createOrReplaceTempView(name)
}
