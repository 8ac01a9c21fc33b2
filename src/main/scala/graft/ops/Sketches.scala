package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sketches: unlike HLL (whose register layout is
  * engine-specific, so `approx_count_distinct` can only ever be
  * rows-checked), a K-Minimum-Values sketch built on an md5-derived
  * hash computes bit-identically in any engine with md5 — the estimate
  * itself is oracle-checkable, and two sketches merge by taking the k
  * smallest of their union (the classic mergeable-summary property,
  * which is what makes the sketch shippable across 1000 executors:
  * each partition sends k longs, the combiner re-mins).
  *
  * Estimator (Bar-Yossef et al.): with kth = the k-th smallest of
  * distinct 48-bit hashes, estimate = (k-1) * 2^48 / kth; when fewer
  * than k distinct hashes exist the count is exact.
  */
object Sketches {

  /** 48-bit md5-derived hash of the value's string form — the same
    * digit-decodable construction as the minhash family. */
  def hash48(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 12), 16, 10).cast("long")

  private[graft] val Space = math.pow(2, 48)

  /** Per-group KMV distinct-count estimate as (groupCols..., est_distinct).
    * Two-stage rank so no group ever lands on one reducer whole: the
    * first window ranks within (group, hash mod 32) — 32 balanced
    * buckets per group, each pruned to its own k smallest — and the
    * second ranks the surviving <= 32k rows per group. The global k
    * smallest are always contained in the union of per-bucket k
    * smallest, so the result is exact. */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val hashed = df
      .select(groupCols.map(col) :+ hash48(col(valueCol)).as("__h"): _*)
      .distinct()
    val local = Window
      .partitionBy(groupCols.map(col) :+ pmod(col("__h"), lit(32)): _*)
      .orderBy("__h")
    val global = Window.partitionBy(groupCols.map(col): _*).orderBy("__h")
    hashed
      .withColumn("__lr", row_number().over(local)).where(col("__lr") <= k)
      .withColumn("__r", row_number().over(global)).where(col("__r") <= k)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"), max("__h").as("__kth"))
      .select(groupCols.map(col) :+
        when(col("__n") < k, col("__n").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * Space / col("__kth"), 4))
          .as("est_distinct"): _*)
  }

  /** Materialized sketch of one frame: the k smallest distinct hashes
    * (driver-side, k longs — the unit that ships between executors). */
  def kmvSketch(df: DataFrame, valueCol: String, k: Int): Seq[Long] =
    df.select(hash48(col(valueCol)).as("__h")).distinct()
      .orderBy("__h").limit(k)
      .collect().map(_.getLong(0)).toSeq

  /** Merge sketches: k smallest of the union — lossless w.r.t. the
    * sketch of the concatenated inputs. */
  def kmvMerge(sketches: Seq[Seq[Long]], k: Int): Seq[Long] =
    sketches.flatten.distinct.sorted.take(k)

  /** Estimate from a materialized sketch. */
  def kmvEstimate(sketch: Seq[Long], k: Int): Double =
    if (sketch.size < k) sketch.size.toDouble
    else BigDecimal((k - 1).toDouble * Space / sketch.max)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
}
