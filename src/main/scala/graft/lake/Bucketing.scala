package graft.lake

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support: pre-shuffling a table once at write time so
  * every subsequent equi-join/aggregation on the bucket key runs
  * WITHOUT an exchange — the co-location lever for repeated 100 TB
  * joins (pay one shuffle at ingest, never again).
  *
  * Spark's bucketing rides the session catalog (managed tables under
  * spark.sql.warehouse.dir), so this is the catalog-backed complement
  * to TableStore's path-based tables.
  */
object Bucketing {

  /** Write `df` as a managed bucketed table (sorted within buckets for
    * merge-friendly reads). Replaces any existing table of that name. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key — planner elides the
    * shuffle when bucket counts line up. */
  def bucketJoin(spark: SparkSession, left: String, right: String,
                 key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
