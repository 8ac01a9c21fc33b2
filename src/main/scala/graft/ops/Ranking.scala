package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ordering primitives that never sort on one reducer.
  *
  * A window over an empty partition spec (`ntile(k).over(orderBy(...))`)
  * moves the WHOLE frame to a single partition — the classic
  * scale-killer. The distributed-exact alternative is the same shape
  * Spark's own `orderBy` uses: range-repartition on the sort keys
  * (sampled boundaries, balanced partitions), rank WITHIN each
  * partition (partition-local window), then add each partition's
  * cumulative row offset. The offsets are one `count` per partition —
  * `numPartitions` longs collected driver-side, the A2-style scalar
  * materialization pattern — so no stage ever sees more than one
  * partition's rows.
  *
  * Requires `orderCols` to be a total order (include a unique
  * tiebreak column); ties across partition boundaries would otherwise
  * make the split nondeterministic.
  */
object Ranking {

  /** Frame range-partitioned on the keys plus a pinned partition id,
    * its per-partition row counts, and the grand total.
    *
    * The frame is localCheckpointed BEFORE the counts job: the range
    * partitioner re-samples its boundaries on every materialization
    * of the exchange, so without the checkpoint the counts job and
    * the downstream rank job can disagree on which partition a row
    * lands in — shifting every offset (observed at sf0.01: ~97% of
    * ranks off). One materialization, both jobs read it. This is the
    * TeraSort discipline: compute boundaries once, reuse. The WHOLE
    * input frame is checkpointed (the ranked rows must come back
    * out), so callers ranking a wide corpus should project the
    * columns they need BEFORE calling — both registered consumers
    * rank 3-column projections.
    */
  private def rangeParted(df: DataFrame, orderCols: Seq[Column],
                          numPartitions: Int): (DataFrame, Array[Long], Long) = {
    val parted = df.repartitionByRange(numPartitions, orderCols: _*)
      .withColumn("__gr_pid", spark_partition_id())
      .localCheckpoint()
    val counts = Array.fill[Long](numPartitions)(0L)
    parted.groupBy("__gr_pid").count().collect()
      .foreach(r => counts(r.getInt(0)) = r.getLong(1))
    (parted, counts, counts.sum)
  }

  /** Map-literal lookup pid -> rows-before-this-partition. */
  private def offsetExpr(counts: Array[Long]): Column = {
    val offsets = counts.scanLeft(0L)(_ + _).init
    val pairs = offsets.zipWithIndex.flatMap { case (off, pid) =>
      Seq(lit(pid), lit(off))
    }
    element_at(map(pairs.toIndexedSeq: _*), col("__gr_pid"))
  }

  /** Exact global 1-based row_number over the total order given by
    * `orderCols`, with no single-partition stage. */
  def globalRowNumber(df: DataFrame, orderCols: Seq[Column], outCol: String,
                      numPartitions: Int = 32): DataFrame = {
    val (parted, counts, _) = rangeParted(df, orderCols, numPartitions)
    val w = Window.partitionBy("__gr_pid").orderBy(orderCols: _*)
    parted
      .withColumn(outCol,
        row_number().over(w).cast("long") + offsetExpr(counts))
      .drop("__gr_pid")
  }

  /** Exact per-group 1-based row_number for FEW heavy groups — the
    * skew case where `Window.partitionBy(group)` would put each
    * group's whole frame on one reducer. Range-partitions on
    * (group ++ order) keys so a group spans many partitions while
    * staying contiguous, ranks within (partition, group), and adds
    * per-(group, partition) offsets — collected driver-side
    * (numPartitions × numGroups longs) and re-entered through a
    * broadcast join, so no stage sees more than one partition's rows.
    * For high-cardinality groups use the plain window: parallelism
    * already equals the group count there. */
  def groupedRowNumber(df: DataFrame, groupCols: Seq[String],
                       orderCols: Seq[Column], outCol: String,
                       numPartitions: Int = 32): DataFrame = {
    import scala.jdk.CollectionConverters._
    val spark = df.sparkSession
    val parted = df
      .repartitionByRange(numPartitions, (groupCols.map(col) ++ orderCols): _*)
      .withColumn("__gr_pid", spark_partition_id())
      .localCheckpoint() // boundary stability — see rangeParted
    val cnt = parted.groupBy((col("__gr_pid") +: groupCols.map(col)): _*)
      .count().collect()
    if (cnt.isEmpty) // empty frame: rank column only, no offsets to join
      return parted.withColumn(outCol, lit(1L)).drop("__gr_pid")
    val offRows = cnt.groupBy(r => groupCols.map(r.getAs[Any]))
      .values.flatMap { rows =>
        val sorted = rows.sortBy(_.getAs[Int]("__gr_pid"))
        sorted.zip(sorted.scanLeft(0L)(_ + _.getAs[Long]("count")).init)
          .map { case (r, off) =>
            org.apache.spark.sql.Row.fromSeq(
              r.toSeq.dropRight(1) :+ off) // (pid, group..., offset)
          }
      }.toSeq
    val offSchema = org.apache.spark.sql.types.StructType(
      cnt.headOption.map(_.schema.fields.dropRight(1)).getOrElse(Array.empty)
        :+ org.apache.spark.sql.types.StructField(
          "__gr_off", org.apache.spark.sql.types.LongType))
    // null-safe (<=>) equi-join: a NULL group key is a regular group
    // under window semantics, and a plain inner join would silently
    // drop its rows (NULL = NULL is false)
    val offsets = spark.createDataFrame(offRows.asJava, offSchema)
      .withColumnRenamed("__gr_pid", "__off_pid")
      .select(col("__off_pid") +: col("__gr_off") +:
        groupCols.map(c => col(c).as(s"__off_$c")): _*)
    val joinCond = groupCols
      .map(c => col(c) <=> col(s"__off_$c"))
      .foldLeft(col("__gr_pid") === col("__off_pid"))(_ && _)
    val w = Window.partitionBy(("__gr_pid" +: groupCols).map(col): _*)
      .orderBy(orderCols: _*)
    parted.join(broadcast(offsets), joinCond)
      .withColumn(outCol, row_number().over(w).cast("long") + col("__gr_off"))
      .drop(("__gr_pid" +: "__gr_off" +: "__off_pid" +:
        groupCols.map(c => s"__off_$c")): _*)
  }

  /** Exact `ntile(n)` over the total order given by `orderCols` —
    * bit-identical to the global-window form (first `total % n` bins
    * get the extra row), but built on [[globalRowNumber]] so the sort
    * stays range-partitioned. */
  def ntileExact(df: DataFrame, orderCols: Seq[Column], n: Int, outCol: String,
                 numPartitions: Int = 32): DataFrame = {
    require(n >= 1, "ntile needs n >= 1")
    val rankCol = "__gr_rank"
    val (parted, counts, total) = rangeParted(df, orderCols, numPartitions)
    val w = Window.partitionBy("__gr_pid").orderBy(orderCols: _*)
    val ranked = parted
      .withColumn(rankCol,
        row_number().over(w).cast("long") + offsetExpr(counts))
    val q = total / n
    val rem = total % n
    val head = rem * (q + 1)
    // 0-based rank; ranks are < 2^53 so the double division below is
    // exact and the positive cast-to-long truncation is a floor.
    val r0 = col(rankCol) - 1
    val bin =
      when(lit(head) > lit(0L) && r0 < lit(head),
        (r0 / lit(q + 1)).cast("long"))
      .otherwise(lit(rem) + ((r0 - lit(head)) / lit(math.max(q, 1L))).cast("long"))
    ranked
      .withColumn(outCol, bin + lit(1L))
      .drop(rankCol, "__gr_pid")
  }
}
