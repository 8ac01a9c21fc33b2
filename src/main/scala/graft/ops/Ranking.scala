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
  * make the split nondeterministic — and the key-uniqueness doubles as
  * the join-back identity for wide frames (below).
  *
  * Wide frames never checkpoint: the boundary-stability checkpoint
  * (see [[rangeParted]]) covers ONLY the sort-key projection. When the
  * input is wider than its keys, the keys are ranked narrow and the
  * rank joins back on the (unique, null-safe) key values — one extra
  * keyed shuffle of the input, instead of materializing a 100 TB
  * corpus into the block manager. When the keys already cover every
  * column, the frame IS the projection and ranks in place.
  */
object Ranking {

  /** The plain attribute name and sort direction under a Column, if it
    * is a bare column reference, optionally wrapped in asc/desc (what
    * every registered consumer passes). The node types are
    * private[sql], so this goes by the printed form: a bare reference
    * prints as exactly its (identifier) name, a directed one as
    * `name ASC|DESC NULLS FIRST|LAST`, while any computed column
    * prints as an expression. Misclassification is safe — a false
    * negative just takes the narrow+join-back path (and a computed
    * sort-order there fails fast, see [[narrowKeys]]). */
  private val SortIdent =
    """([A-Za-z_][A-Za-z0-9_]*)(?: (ASC|DESC) NULLS (FIRST|LAST))?""".r
  private def parseOrder(c: Column): Option[(String, String)] =
    c.toString match {
      case SortIdent(n, null, null) => Some((n, ""))
      case SortIdent(n, d, nf) => Some((n, s"$d:$nf"))
      case _ => None
    }
  private def isSortWrapped(c: Column): Boolean =
    c.toString.matches("(?s).* (ASC|DESC) NULLS (FIRST|LAST)")
  private def applyDir(c: Column, dir: String): Column = dir match {
    case "" => c
    case "ASC:FIRST" => c.asc_nulls_first
    case "ASC:LAST" => c.asc_nulls_last
    case "DESC:FIRST" => c.desc_nulls_first
    case "DESC:LAST" => c.desc_nulls_last
  }

  /** True iff `keyCols` are all bare column references (any sort
    * direction) that cover `df`'s columns exactly — ranking in place
    * checkpoints nothing beyond the keys then, so no narrowing is
    * needed. */
  private def coversFrame(df: DataFrame, keyCols: Seq[Column]): Boolean = {
    val names = keyCols.map(parseOrder)
    names.forall(_.isDefined) &&
      names.flatten.map(_._1.toLowerCase).toSet ==
        df.columns.map(_.toLowerCase).toSet
  }

  /** The narrow projection of `orderCols` under alias `prefix$i`, with
    * sort directions lifted OUT of the projection (a SortOrder cannot
    * be selected) and re-applied to the aliased keys, plus the
    * null-safe join-back condition. A computed expression carrying a
    * direction cannot be decomposed from outside catalyst, so it fails
    * fast with a usable message instead of a downstream
    * AnalysisException — alias it to a column first. */
  private case class NarrowKeys(projection: Seq[Column], sortKeys: Seq[Column],
                                joinConds: Seq[Column], keyNames: Seq[String])
  private def narrowKeys(orderCols: Seq[Column], prefix: String): NarrowKeys = {
    val keyNames = orderCols.indices.map(i => s"__gr_$prefix$i")
    val parsed = orderCols.map(c => (c, parseOrder(c)))
    val projection = parsed.zip(keyNames).map {
      case ((_, Some((n, _))), kN) => col(n).as(kN)
      case ((c, None), kN) =>
        require(!isSortWrapped(c),
          s"Ranking: cannot narrow a computed sort-order expression ($c) " +
            "for a wide frame; alias the expression to a column first")
        c.as(kN)
    }
    val sortKeys = parsed.zip(keyNames).map {
      case ((_, Some((_, dir))), kN) => applyDir(col(kN), dir)
      case ((_, None), kN) => col(kN)
    }
    val joinConds = parsed.zip(keyNames).map {
      case ((_, Some((n, _))), kN) => col(n) <=> col(kN)
      case ((c, None), kN) => c <=> col(kN)
    }
    NarrowKeys(projection, sortKeys, joinConds, keyNames)
  }

  /** Frame range-partitioned on the keys plus a pinned partition id,
    * its per-partition row counts, and the grand total.
    *
    * The frame is localCheckpointed BEFORE the counts job: the range
    * partitioner re-samples its boundaries on every materialization
    * of the exchange, so without the checkpoint the counts job and
    * the downstream rank job can disagree on which partition a row
    * lands in — shifting every offset (observed at sf0.01: ~97% of
    * ranks off). One materialization, both jobs read it. This is the
    * TeraSort discipline: compute boundaries once, reuse. Callers
    * guarantee `df` is at most keys-wide (the public entry points
    * narrow wide frames first and join the rank back).
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

  /** Exact global rank into `rankCol`, checkpointing only the key
    * projection; returns the ranked frame (original columns + rank)
    * and the grand total. */
  private def withExactRank(df: DataFrame, orderCols: Seq[Column],
                            rankCol: String,
                            numPartitions: Int): (DataFrame, Long) =
    if (coversFrame(df, orderCols)) {
      val (parted, counts, total) = rangeParted(df, orderCols, numPartitions)
      val w = Window.partitionBy("__gr_pid").orderBy(orderCols: _*)
      (parted.withColumn(rankCol,
        row_number().over(w).cast("long") + offsetExpr(counts))
        .drop("__gr_pid"), total)
    } else {
      val nk = narrowKeys(orderCols, "k")
      val narrow = df.select(nk.projection: _*)
      val (parted, counts, total) = rangeParted(narrow, nk.sortKeys,
        numPartitions)
      val w = Window.partitionBy("__gr_pid").orderBy(nk.sortKeys: _*)
      val ranked = parted.withColumn(rankCol,
        row_number().over(w).cast("long") + offsetExpr(counts))
        .drop("__gr_pid")
      // total order ⇒ the key VALUES are a unique identity; null-safe
      // so a NULL key component still finds its row. Collapsing to
      // min(rank) per key tuple makes a VIOLATED total-order
      // precondition degrade to shared ranks (the window's own tie
      // behavior), never to join-back row multiplication.
      val uniq = ranked.groupBy(nk.keyNames.map(col): _*)
        .agg(min(rankCol).as(rankCol))
      (df.join(uniq, nk.joinConds.reduce(_ && _)).drop(nk.keyNames: _*),
        total)
    }

  /** Exact global 1-based row_number over the total order given by
    * `orderCols`, with no single-partition stage. */
  def globalRowNumber(df: DataFrame, orderCols: Seq[Column], outCol: String,
                      numPartitions: Int = 32): DataFrame =
    withExactRank(df, orderCols, outCol, numPartitions)._1

  /** [[globalRowNumber]] plus the grand total row count — the total
    * falls out of the per-partition offset counts the rank needs
    * anyway, so callers that also want N (rank-selection percentiles:
    * target rank = ceil(p·N)) avoid a separate full-scan count job. */
  def globalRowNumberWithTotal(df: DataFrame, orderCols: Seq[Column],
                               outCol: String,
                               numPartitions: Int = 32): (DataFrame, Long) =
    withExactRank(df, orderCols, outCol, numPartitions)

  /** Exact global rank AND running total of `valueName` over the
    * total order given by `orderCols` — the distributed prefix sum.
    * A cumulative `sum().over(orderBy(...))` with no partition spec
    * is the same single-reducer trap as global row_number, and the
    * fix is the same TeraSort discipline: range-partition on the sort
    * keys, accumulate WITHIN each partition, and add per-partition
    * offsets (here: both the row-count offsets for the rank and the
    * value-sum offsets for the running total — one driver-side
    * collect of 2×numPartitions longs covers both). Requires a frame
    * already projected to its sort keys + the value (the coverage
    * checkpoint ships only those columns); `valueName` must be
    * integral (offsets are exact longs). Returns
    * (frame + rankCol + cumCol, total rows, total value). */
  def rankedPrefixSum(df: DataFrame, orderCols: Seq[Column],
                      valueName: String, rankCol: String, cumCol: String,
                      numPartitions: Int = 32): (DataFrame, Long, Long) = {
    require(coversFrame(df, orderCols),
      "rankedPrefixSum: project the frame to exactly its sort keys first " +
        "(the range checkpoint must stay narrow)")
    val parted = df.repartitionByRange(numPartitions, orderCols: _*)
      .withColumn("__gr_pid", spark_partition_id())
      .localCheckpoint() // boundary stability — see rangeParted
    val counts = Array.fill[Long](numPartitions)(0L)
    val sums = Array.fill[Long](numPartitions)(0L)
    // coalesce: an all-NULL partition sums to NULL (SQL), which must
    // read as a zero offset contribution, not a driver NPE
    parted.groupBy("__gr_pid")
      .agg(count(lit(1)).as("__gr_c"),
        coalesce(sum(col(valueName).cast("long")), lit(0L)).as("__gr_s"))
      .collect().foreach { r =>
        counts(r.getInt(0)) = r.getLong(1)
        sums(r.getInt(0)) = r.getLong(2)
      }
    val w = Window.partitionBy("__gr_pid").orderBy(orderCols: _*)
    // same NULL convention as the offsets: a NULL value contributes 0
    // to the running total instead of nulling the whole prefix
    val cumLocal = coalesce(
      sum(col(valueName).cast("long"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
      lit(0L))
    (parted
      .withColumn(rankCol, row_number().over(w).cast("long") + offsetExpr(counts))
      .withColumn(cumCol, cumLocal + offsetExpr(sums))
      .drop("__gr_pid"), counts.sum, sums.sum)
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
    * already equals the group count there. Wide frames rank on the
    * (group, key) projection and join back, as [[globalRowNumber]]. */
  def groupedRowNumber(df: DataFrame, groupCols: Seq[String],
                       orderCols: Seq[Column], outCol: String,
                       numPartitions: Int = 32): DataFrame =
    if (coversFrame(df, groupCols.map(col) ++ orderCols))
      groupedCore(df, groupCols, orderCols, outCol, numPartitions)
    else {
      val gNames = groupCols.indices.map(i => s"__gr_g$i")
      val nk = narrowKeys(orderCols, "k")
      val narrow = df.select(
        (groupCols.zip(gNames).map { case (g, n) => col(g).as(n) } ++
          nk.projection): _*)
      val ranked = groupedCore(narrow, gNames, nk.sortKeys, outCol,
        numPartitions)
      // min-rank collapse: see withExactRank — a duplicate
      // (group, key) tuple shares a rank instead of multiplying rows
      val uniq = ranked.groupBy((gNames ++ nk.keyNames).map(col): _*)
        .agg(min(outCol).as(outCol))
      val cond = (groupCols.zip(gNames).map { case (g, n) =>
        col(g) <=> col(n)
      } ++ nk.joinConds).reduce(_ && _)
      df.join(uniq, cond).drop((gNames ++ nk.keyNames): _*)
    }

  private def groupedCore(df: DataFrame, groupCols: Seq[String],
                          orderCols: Seq[Column], outCol: String,
                          numPartitions: Int): DataFrame = {
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
    val (ranked, total) = withExactRank(df, orderCols, rankCol, numPartitions)
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
      .drop(rankCol)
  }
}
