package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking must be bit-identical to the global-window forms it
  * replaces — same rank, same ntile bins — while never planning a
  * partition-less window. */
class RankingSpec extends SparkSpec {

  import spark.implicits._

  // deliberately awkward sizes: not divisible by the bin count or the
  // partition count, with duplicate sort keys broken by a unique id
  private lazy val df = spark.range(1037)
    .select(col("id"), pmod(hash(col("id")), lit(97)).cast("long").as("score"))

  test("globalRowNumber equals the single-partition row_number") {
    val expected = df.withColumn("r",
      row_number().over(Window.orderBy("score", "id")).cast("long"))
    val got = Ranking.globalRowNumber(df, Seq(col("score"), col("id")), "r",
      numPartitions = 7)
    assert(got.join(expected.withColumnRenamed("r", "r2"), Seq("id"))
      .where(col("r") =!= col("r2")).count() == 0)
    assert(got.count() == 1037)
  }

  test("ntileExact matches global ntile for several n, incl. n > rows") {
    for (n <- Seq(1, 3, 10, 64, 2000)) {
      val expected = df.withColumn("bin",
        ntile(n).over(Window.orderBy("score", "id")).cast("long"))
      val got = Ranking.ntileExact(df, Seq(col("score"), col("id")), n, "bin",
        numPartitions = 7)
      val diffs = got.withColumnRenamed("bin", "got")
        .join(expected, Seq("id"))
        .where(col("got") =!= col("bin")).count()
      assert(diffs == 0, s"ntile($n) mismatch on $diffs rows")
    }
  }

  test("ntileExact plans only partitioned windows") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val plan = Ranking
      .ntileExact(df, Seq(col("score"), col("id")), 10, "bin")
      .queryExecution.optimizedPlan
    val global = plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
    assert(global.isEmpty, "found a partition-less window")
  }

  test("groupedRowNumber equals per-group row_number, groups span partitions") {
    // 3 heavy groups over 7 range partitions: each group MUST cross
    // partition boundaries for the offset arithmetic to be exercised
    val g = df.withColumn("grp", pmod(col("id"), lit(3)).cast("int"))
    val expected = g.withColumn("r2", row_number()
      .over(Window.partitionBy("grp").orderBy("score", "id")).cast("long"))
    val got = Ranking.groupedRowNumber(g, Seq("grp"),
      Seq(col("score"), col("id")), "r", numPartitions = 7)
    assert(got.join(expected, Seq("id"))
      .where(col("r") =!= col("r2")).count() == 0)
    assert(got.count() == 1037)
    // ...and the frame really is spread: more distinct (pid) than groups
    val parts = g.repartitionByRange(7, col("grp"), col("score"), col("id"))
      .select(org.apache.spark.sql.functions.spark_partition_id())
      .distinct().count()
    assert(parts > 3)
  }

  test("groupedRowNumber keeps NULL group keys as a regular group") {
    val g = df.withColumn("grp",
      when(pmod(col("id"), lit(4)) === 0, lit(null).cast("int"))
        .otherwise(pmod(col("id"), lit(4)).cast("int")))
    val expected = g.withColumn("r2", row_number()
      .over(Window.partitionBy("grp").orderBy("score", "id")).cast("long"))
    val got = Ranking.groupedRowNumber(g, Seq("grp"),
      Seq(col("score"), col("id")), "r", numPartitions = 7)
    assert(got.count() == 1037, "NULL-group rows were dropped")
    assert(got.join(expected, Seq("id"))
      .where(col("r") =!= col("r2")).count() == 0)
  }

  // a WIDE frame: the rank must come from a narrow key projection
  // joined back, never a checkpoint of the payload columns
  private lazy val wide = df
    .withColumn("payload_a", concat(lit("x"), col("id")))
    .withColumn("payload_b", array(col("id"), col("id") * 2))
    .withColumn("payload_c", col("score") * 1.5)

  /** Every localCheckpoint scan (LogicalRDD) in the plan must be at
    * most `maxWidth` attributes wide — the payload never checkpoints. */
  private def assertNarrowCheckpoints(df2: org.apache.spark.sql.DataFrame,
                                      maxWidth: Int): Unit = {
    val rdds = df2.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.output
    }
    assert(rdds.nonEmpty, "expected a checkpointed key projection")
    rdds.foreach { out =>
      assert(out.size <= maxWidth,
        s"checkpointed ${out.size} columns (${out.map(_.name).mkString(",")}), " +
          s"expected <= $maxWidth")
    }
  }

  test("globalRowNumber on a wide frame checkpoints only the keys") {
    val expected = wide.withColumn("r2",
      row_number().over(Window.orderBy("score", "id")).cast("long"))
    val got = Ranking.globalRowNumber(wide, Seq(col("score"), col("id")), "r",
      numPartitions = 7)
    assert(got.join(expected, Seq("id"))
      .where(col("r") =!= col("r2")).count() == 0)
    assert(got.count() == 1037 &&
      got.columns.toSet == (wide.columns :+ "r").toSet)
    // 2 keys + __gr_pid
    assertNarrowCheckpoints(got, 3)
  }

  test("ntileExact on a wide frame matches global ntile and stays narrow") {
    val expected = wide.withColumn("bin2",
      ntile(10).over(Window.orderBy("score", "id")).cast("long"))
    val got = Ranking.ntileExact(wide, Seq(col("score"), col("id")), 10, "bin",
      numPartitions = 7)
    assert(got.join(expected, Seq("id"))
      .where(col("bin") =!= col("bin2")).count() == 0)
    assertNarrowCheckpoints(got, 3)
  }

  test("groupedRowNumber on a wide frame checkpoints only group + keys") {
    val g = wide.withColumn("grp", pmod(col("id"), lit(3)).cast("int"))
    val expected = g.withColumn("r2", row_number()
      .over(Window.partitionBy("grp").orderBy("score", "id")).cast("long"))
    val got = Ranking.groupedRowNumber(g, Seq("grp"),
      Seq(col("score"), col("id")), "r", numPartitions = 7)
    assert(got.join(expected, Seq("id"))
      .where(col("r") =!= col("r2")).count() == 0)
    assert(got.count() == 1037)
    // grp + 2 keys + __gr_pid
    assertNarrowCheckpoints(got, 4)
  }

  test("descending sort keys rank correctly on wide AND covering frames") {
    val expected = wide.withColumn("r2", row_number()
      .over(Window.orderBy(col("score").desc, col("id"))).cast("long"))
    val got = Ranking.globalRowNumber(wide,
      Seq(col("score").desc, col("id")), "r", numPartitions = 7)
    assert(got.join(expected, Seq("id"))
      .where(col("r") =!= col("r2")).count() == 0)
    assertNarrowCheckpoints(got, 3)
    // covering frame: desc key ranks in place, same answer
    val gotCover = Ranking.globalRowNumber(df,
      Seq(col("score").desc, col("id")), "r", numPartitions = 7)
    assert(gotCover.join(expected, Seq("id"))
      .where(col("r") =!= col("r2")).count() == 0)
    // nulls-first variant must not silently invert
    val gotNf = Ranking.globalRowNumber(wide,
      Seq(col("score").desc_nulls_first, col("id")), "r", numPartitions = 7)
    assert(gotNf.join(expected, Seq("id"))
      .where(col("r") =!= col("r2")).count() == 0)
  }

  test("groupedRowNumber honors descending keys on a wide frame") {
    val g = wide.withColumn("grp", pmod(col("id"), lit(3)).cast("int"))
    val expected = g.withColumn("r2", row_number()
      .over(Window.partitionBy("grp").orderBy(col("score").desc, col("id")))
      .cast("long"))
    val got = Ranking.groupedRowNumber(g, Seq("grp"),
      Seq(col("score").desc, col("id")), "r", numPartitions = 7)
    assert(got.join(expected, Seq("id"))
      .where(col("r") =!= col("r2")).count() == 0)
  }

  test("a computed sort-order on a wide frame fails fast, not downstream") {
    val e = intercept[IllegalArgumentException] {
      Ranking.globalRowNumber(wide,
        Seq((col("score") * 2).desc, col("id")), "r")
    }
    assert(e.getMessage.contains("alias the expression"))
  }

  test("duplicate key tuples degrade to shared ranks, never extra rows") {
    // score alone is NOT a total order: ~97 distinct values over 1037
    // rows. The join-back must keep exactly one output row per input
    // row (shared ranks), not multiply matches.
    val got = Ranking.globalRowNumber(wide, Seq(col("score")), "r",
      numPartitions = 7)
    assert(got.count() === 1037)
    // ranks are still plausible positions: min 1, all within 1..1037
    val mm = got.agg(min("r"), max("r")).head()
    assert(mm.getLong(0) == 1L && mm.getLong(1) <= 1037L)
    val g = wide.withColumn("grp", pmod(col("id"), lit(3)).cast("int"))
    val gotG = Ranking.groupedRowNumber(g, Seq("grp"), Seq(col("score")), "r",
      numPartitions = 7)
    assert(gotG.count() === 1037)
  }

  test("rankedPrefixSum equals the global-window rank + running total") {
    val expected = df.withColumn("r",
        row_number().over(Window.orderBy(col("score").desc, col("id")))
          .cast("long"))
      .withColumn("c", sum("score").over(
        Window.orderBy(col("score").desc, col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val (got, n, tot) = Ranking.rankedPrefixSum(df,
      Seq(col("score").desc, col("id")), "score", "r", "c",
      numPartitions = 7)
    assert(n == 1037L)
    assert(tot == df.agg(sum("score")).head.getLong(0))
    val joined = got.join(
      expected.select(col("id"), col("r").as("r2"), col("c").as("c2")),
      Seq("id"))
    assert(joined.where(col("r") =!= col("r2") || col("c") =!= col("c2"))
      .count() == 0)
    // partition-count independence
    val (got3, _, _) = Ranking.rankedPrefixSum(df.repartition(13),
      Seq(col("score").desc, col("id")), "score", "r", "c",
      numPartitions = 3)
    assert(got3.join(joined.select(col("id"), col("c2")), Seq("id"))
      .where(col("c") =!= col("c2")).count() == 0)
  }

  test("rankedPrefixSum rejects a frame wider than its sort keys") {
    val wide = df.withColumn("extra", lit("x"))
    intercept[IllegalArgumentException] {
      Ranking.rankedPrefixSum(wide, Seq(col("score"), col("id")),
        "score", "r", "c")
    }
  }

  test("groupedRowNumber on an empty frame returns empty with the rank column") {
    val g = df.where(lit(false))
      .withColumn("grp", pmod(col("id"), lit(3)).cast("int"))
    val got = Ranking.groupedRowNumber(g, Seq("grp"),
      Seq(col("score"), col("id")), "r")
    assert(got.columns.contains("r") && got.count() == 0)
  }
}
