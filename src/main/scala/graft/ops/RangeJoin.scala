package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: points to the half-open intervals
  * `[start, end)` containing them, without the O(points × intervals)
  * theta join Spark would otherwise plan for a BETWEEN condition.
  *
  * Bucketing: pick a width `w`; each point belongs to exactly one
  * bucket `floor(p / w)`, each interval explodes to the buckets it
  * overlaps (`sequence(floor(start/w), floor(end/w))` — ~len/w + 1
  * rows). The join becomes a plain equi-join on the bucket id followed
  * by the exact range predicate; a (point, interval) pair can meet in
  * at most one bucket (the point's), so no dedup is needed. Pick `w`
  * near the median interval length: the explode factor stays O(1) and
  * bucket population stays balanced — the standard trick from
  * spatial/temporal engines. At 100 TB this is one shuffle of each
  * side on the bucket id.
  */
object RangeJoin {

  /** Join `points` (`pCol`) into `intervals` (`[startCol, endCol)`),
    * both in the same integral unit. Output: every (interval row ++
    * point row) pair where the point falls in the interval. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pCol: String, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p2 = points.withColumn("__bucket", floor(col(pCol) / bucketWidth))
    val iv2 = intervals.withColumn("__bucket",
      explode(sequence(floor(col(startCol) / bucketWidth),
        floor((col(endCol) - 1) / bucketWidth))))
    iv2.join(p2, Seq("__bucket"))
      .where(col(pCol) >= col(startCol) && col(pCol) < col(endCol))
      .drop("__bucket")
  }
}
