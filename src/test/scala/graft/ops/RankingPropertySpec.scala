package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Property check (seeded, deterministic, same style as
  * CdcPropertySpec): the distributed exact rank/ntile must agree with
  * the single-partition window forms on arbitrary sizes, duplicate
  * densities, bin counts, and partition counts — the shapes where an
  * off-by-one in the offset or bin arithmetic would hide. */
class RankingPropertySpec extends SparkSpec {

  test("ntileExact == window ntile across randomized shapes") {
    val rnd = new scala.util.Random(41L)
    for (_ <- 1 to 10) {
      val rows = 1 + rnd.nextInt(400)
      // key cardinality: dupMod=1 → ONE key (all rows tie, the
      // cross-partition tie-break stress), 50 → lightest ties
      val dupMod = Seq(1, 3, 50)(rnd.nextInt(3))
      val n = Seq(1, 2, 7, 10, 500)(rnd.nextInt(5))
      val parts = Seq(2, 5, 13)(rnd.nextInt(3))
      val df = spark.range(rows.toLong)
        .select(col("id"),
          pmod(hash(col("id")), lit(dupMod)).cast("long").as("k"))
      val expected = df.withColumn("bin",
        ntile(n).over(Window.orderBy("k", "id")).cast("long"))
      val got = Ranking.ntileExact(df, Seq(col("k"), col("id")), n, "bin",
        numPartitions = parts)
      // no rows lost or duplicated — an inner-join diff alone would
      // pass vacuously on an operator that drops rows
      assert(got.count() == rows,
        s"rows=$rows dupMod=$dupMod n=$n parts=$parts: wrong row count")
      val diffs = got.withColumnRenamed("bin", "got")
        .join(expected, Seq("id"))
        .where(col("got") =!= col("bin")).count()
      assert(diffs == 0,
        s"rows=$rows dupMod=$dupMod n=$n parts=$parts: $diffs wrong bins")
    }
  }

  test("globalRowNumber == window row_number across randomized shapes") {
    val rnd = new scala.util.Random(42L)
    for (_ <- 1 to 5) {
      val rows = 1 + rnd.nextInt(300)
      val parts = Seq(2, 7, 31)(rnd.nextInt(3))
      val df = spark.range(rows.toLong)
        .select(col("id"), pmod(hash(col("id")), lit(5)).cast("long").as("k"))
      val expected = df.withColumn("r",
        row_number().over(Window.orderBy("k", "id")).cast("long"))
      val got = Ranking.globalRowNumber(df, Seq(col("k"), col("id")), "r",
        numPartitions = parts)
      assert(got.count() == rows, s"rows=$rows parts=$parts: wrong row count")
      val diffs = got.withColumnRenamed("r", "got")
        .join(expected, Seq("id"))
        .where(col("got") =!= col("r")).count()
      assert(diffs == 0, s"rows=$rows parts=$parts: $diffs wrong ranks")
    }
  }
}
