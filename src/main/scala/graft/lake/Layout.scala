package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional clustering layouts (the OPTIMIZE ZORDER of the
  * lakehouse engines): interleave the bits of several dimensions into
  * one z-value, then range-partition + sort by it. Rows close in z are
  * close in EVERY dimension, so each written file covers a compact
  * hyper-rectangle and parquet row-group min/max stats prune
  * multi-dimensional predicates — a single-column sort only prunes its
  * leading column. At 100 TB this is the difference between a
  * two-predicate scan touching ~sqrt(files) and touching all of them.
  */
object Layout {

  /** Z-value: interleave the low `bits` bits of each (non-negative
    * integral) dimension. Dim d's bit b lands at position
    * b * ndims + d; pure shift/mask arithmetic, fully codegen'd.
    * ndims * bits must fit a long (<= 63). Callers bucketize
    * unbounded or signed domains first. */
  def zvalue(dims: Seq[Column], bits: Int = 16): Column = {
    require(dims.nonEmpty && dims.size * bits <= 63,
      s"${dims.size} dims x $bits bits exceeds a long")
    val terms = for {
      b <- 0 until bits
      (d, i) <- dims.zipWithIndex
    } yield shiftleft(
      shiftright(d.cast("long"), b).bitwiseAND(lit(1L)),
      b * dims.size + i)
    terms.reduce(_ + _)
  }

  /** Rewrite `df` into `numFiles` z-ordered ranges over `dims`
    * (each written file = one compact hyper-rectangle). The z column
    * is dropped after sorting — it exists only to drive the layout. */
  def cluster(df: DataFrame, dims: Seq[String], numFiles: Int,
              bits: Int = 16): DataFrame =
    df.withColumn("__z", zvalue(dims.map(col), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
}
