package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, the most recent right row
  * of the same key with `rightTs <= leftTs` — the point-in-time lookup
  * every feature/training pipeline needs (trades→quotes, events→state).
  *
  * Spark has no native ASOF JOIN; the naive formulation is a non-equi
  * theta join (O(n·m) within key). This is the scale-safe union-window
  * form instead: tag both sides, union, and take per key a running
  * `last(right payload, ignoreNulls)` ordered by (ts, side) — ONE
  * shuffle on the key and one sort, no join operator in the plan at
  * all. Right rows sort before left rows at equal ts, so the match is
  * inclusive. At 100 TB both sides shuffle once on the key — the same
  * cost as a single sort-merge join, with per-key memory O(1).
  */
object AsofJoin {

  /** Backward as-of join. `rightCols` are the right-side payload
    * columns to carry (plus `rightTs`, returned under its own name);
    * their names must not collide with left columns. `toleranceUs`
    * (same unit as the ts columns) nulls out matches older than
    * `leftTs - tolerance`. Right rows must be unique per
    * (key, rightTs) for a deterministic result — pre-aggregate ties.
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, rightCols: Seq[String],
               toleranceUs: Option[Long] = None): DataFrame = {
    val rightOut = rightTs +: rightCols
    require(rightOut.toSet.intersect(left.columns.toSet).isEmpty,
      s"right output columns ${rightOut.mkString(",")} collide with left")

    val r2 = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__side"),
        struct(rightOut.map(col): _*).as("__r")): _*)
    val rType = r2.schema("__r").dataType
    val leftPayload = left.columns.toSeq.filterNot(c =>
      keys.contains(c) || c == leftTs)
    val l2 = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast(rType).as("__r")) ++ leftPayload.map(col): _*)

    val combined = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = combined
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val bounded = toleranceUs match {
      case Some(tol) => matched.withColumn("__m",
        when(col("__ts") - col(s"__m.$rightTs") <= tol, col("__m"))
          .otherwise(lit(null).cast(rType)))
      case None => matched
    }
    bounded.select(
      keys.map(col) ++ Seq(col("__ts").as(leftTs)) ++
        leftPayload.map(col) ++
        rightOut.map(c => col(s"__m.$c").as(c)): _*)
  }
}
