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

  /** Forward as-of join: for each left row, the EARLIEST right row of
    * the same key with `rightTs >= leftTs` (inclusive) — the
    * next-event lookup (pandas/polars `merge_asof(direction=
    * 'forward')`). Same union-window plan as [[backward]], mirrored:
    * left rows sort before right rows at equal ts and the running
    * `first(payload, ignoreNulls)` looks over the FOLLOWING frame —
    * one shuffle on the key, no join operator. `toleranceUs` nulls
    * out matches later than `leftTs + tolerance`. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String, rightCols: Seq[String],
              toleranceUs: Option[Long] = None): DataFrame = {
    val rightOut = rightTs +: rightCols
    require(rightOut.toSet.intersect(left.columns.toSet).isEmpty,
      s"right output columns ${rightOut.mkString(",")} collide with left")
    val r2 = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(2).as("__side"),
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
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = combined
      .withColumn("__m", first(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val bounded = toleranceUs match {
      case Some(tol) => matched.withColumn("__m",
        when(col(s"__m.$rightTs") - col("__ts") <= tol, col("__m"))
          .otherwise(lit(null).cast(rType)))
      case None => matched
    }
    bounded.select(
      keys.map(col) ++ Seq(col("__ts").as(leftTs)) ++
        leftPayload.map(col) ++
        rightOut.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Nearest as-of join: for each left row, the right row minimizing
    * |rightTs − leftTs| (ties → the backward match, pandas semantics).
    * ONE union-window pass computing BOTH directions over the same
    * key-partitioned sort — right rows take side 0 so the equal-ts
    * match lands in the backward leg at distance 0, which wins every
    * tie by construction. `toleranceUs` bounds both directions.
    * Output columns carry a `__dir` ('backward'/'forward'/null) so
    * callers can audit which leg matched. */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String, rightCols: Seq[String],
              toleranceUs: Option[Long] = None): DataFrame = {
    val rightOut = rightTs +: rightCols
    require((rightOut :+ "asof_dir").toSet.intersect(left.columns.toSet).isEmpty,
      s"right output columns ${rightOut.mkString(",")} (and asof_dir) " +
        "collide with left — rename the earlier asof_dir before chaining")
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
    val base = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
    val wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val both = combined
      .withColumn("__mb", last(col("__r"), ignoreNulls = true).over(wb))
      .withColumn("__mf", first(col("__r"), ignoreNulls = true).over(wf))
      .where(col("__side") === 1)
    val db = col("__ts") - col(s"__mb.$rightTs")
    val df0 = col(s"__mf.$rightTs") - col("__ts")
    val inTol = (d: org.apache.spark.sql.Column) =>
      toleranceUs.map(t => d <= t).getOrElse(lit(true))
    val pick = both.withColumn("__m",
      when(col("__mb").isNotNull && inTol(db) &&
          (col("__mf").isNull || !inTol(df0) || db <= df0), col("__mb"))
        .when(col("__mf").isNotNull && inTol(df0), col("__mf"))
        .otherwise(lit(null).cast(rType)))
      .withColumn("__dir",
        when(col("__m").isNull, lit(null).cast("string"))
          .when(col("__m") === col("__mb"), lit("backward"))
          .otherwise(lit("forward")))
    pick.select(
      keys.map(col) ++ Seq(col("__ts").as(leftTs)) ++
        leftPayload.map(col) ++
        rightOut.map(c => col(s"__m.$c").as(c)) :+
        col("__dir").as("asof_dir"): _*)
  }
}
