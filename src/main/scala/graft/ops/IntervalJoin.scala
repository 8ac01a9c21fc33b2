package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed interval-overlap join — the interval join of the streaming
  * engines, batch form: pairs of rows sharing a key whose
  * [start, end] spans intersect.
  *
  * Scale design (100 TB): the join is an EQUI-join on the key columns
  * (shuffle-bounded, AQE-skew-splittable); the overlap predicate is a
  * residual filter inside the joined partition, so no theta or
  * cartesian join ever plans. Per-key pair count is the quadratic
  * bound — callers key by something with bounded fan-in (user,
  * customer, device). For UN-keyed overlap at scale, bucketize time
  * into chunk-width keys first (each interval explodes to the chunks
  * it covers — the [[RangeJoin]] discipline) and dedup pairs after.
  */
object IntervalJoin {

  /** Self-overlap pairs within `df`: rows with equal `keyCols` whose
    * spans intersect, emitted once per pair (`a_<id> < b_<id>`), with
    * the intersection bounds. */
  def selfOverlapPairs(df: DataFrame, keyCols: Seq[String], idCol: String,
                       startCol: String, endCol: String): DataFrame = {
    val base = df.select((keyCols :+ idCol :+ startCol :+ endCol)
      .map(col).toIndexedSeq: _*)
    def side(p: String) = base
      .withColumnRenamed(idCol, s"${p}_$idCol")
      .withColumnRenamed(startCol, s"${p}_$startCol")
      .withColumnRenamed(endCol, s"${p}_$endCol")
    val a = side("a")
    val b = side("b")
    a.join(b, keyCols)
      .where(col(s"a_$idCol") < col(s"b_$idCol") &&
        col(s"a_$startCol") <= col(s"b_$endCol") &&
        col(s"b_$startCol") <= col(s"a_$endCol"))
      .withColumn("overlap_start",
        greatest(col(s"a_$startCol"), col(s"b_$startCol")))
      .withColumn("overlap_end",
        least(col(s"a_$endCol"), col(s"b_$endCol")))
  }
}
