package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MembershipSpec extends SparkSpec {
  import spark.implicits._

  private def big =
    (1L to 2000L).map(i => (i, s"k${i % 500}")).toDF("id", "key")
  private def small =
    (0L until 50L).map(i => s"k$i").toDF("dkey")

  test("bloomAntiJoin equals the plain left_anti join") {
    val got = Membership.bloomAntiJoin(big, col("key"), small, col("dkey"),
        expectedItems = 100, fpp = 0.3) // high fpp: exercise the verify path
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val want = big.join(small, col("key") === col("dkey"), "left_anti")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want && want.nonEmpty)
  }

  test("bloomSemiJoin equals the plain left_semi join") {
    val got = Membership.bloomSemiJoin(big, col("key"), small, col("dkey"),
        expectedItems = 100, fpp = 0.3)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val want = big.join(small, col("key") === col("dkey"), "left_semi")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want && want.nonEmpty)
  }

  test("bloom joins keep/drop NULL and identically-named keys correctly") {
    val b = Seq((1L, Some("x")), (2L, None), (3L, Some("y")))
      .toDF("id", "sh")
    val sm = Seq(Some("x"), None).toDF("sh") // same column name both sides
    val anti = Membership.bloomAntiJoin(b, col("sh"), sm, col("sh"), 10)
      .select("id").collect().map(_.getLong(0)).toSet
    // NULL never matches in SQL joins: row 2 survives the anti join
    assert(anti == Set(2L, 3L))
    val semi = Membership.bloomSemiJoin(b, col("sh"), sm, col("sh"), 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(semi == Set(1L))
  }

  test("no false negatives: every true match is always bloom-confirmed") {
    // 5k distinct keys through a deliberately undersized filter — fpp
    // soars but a semi join may never LOSE a true match
    val b = (1L to 5000L).map(i => (i, s"key-$i")).toDF("id", "key")
    val sm = (1L to 5000L by 7).map(i => s"key-$i").toDF("dkey")
    val got = Membership.bloomSemiJoin(b, col("key"), sm, col("dkey"),
        expectedItems = 50, fpp = 0.5)
      .count()
    assert(got == (1L to 5000L by 7).size)
  }

  test("heavyHitters returns exactly the keys at/above threshold with exact counts") {
    // key i appears i times, i in 1..60
    val rows = (1 to 60).flatMap(i => Seq.fill(i)(s"t$i")).toDF("tok")
    val got = Membership.heavyHitters(rows, col("tok"), minCount = 40,
        eps = 0.01, confidence = 0.9)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = (40 to 60).map(i => s"t$i" -> i.toLong).toMap
    assert(got == want)
  }

  test("heavyHitters candidate pruning survives a coarse sketch (superset property)") {
    val rows = (1 to 200).flatMap(i => Seq.fill(if (i <= 5) 100 else 2)(s"w$i"))
      .toDF("tok")
    // eps so coarse every counter collides — result must STILL be exact
    val got = Membership.heavyHitters(rows, col("tok"), minCount = 100,
        eps = 0.5, confidence = 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == (1 to 5).map(i => s"w$i" -> 100L).toMap)
  }

  test("native probes stay codegen'd: no ScalaUDF in either plan") {
    // a file source, not a LocalRelation — ConvertToLocalRelation
    // would otherwise evaluate the probe at optimization time and
    // leave nothing to assert on
    val dir = tmpDir("mb-plan")
    big.write.mode("overwrite").parquet(s"$dir/big")
    val bigF = spark.read.parquet(s"$dir/big")
    val anti = Membership.bloomAntiJoin(bigF, col("key"), small, col("dkey"),
      expectedItems = 100).queryExecution.executedPlan.toString
    assert(anti.toLowerCase.contains("bloommightcontainlong"), anti.take(800))
    assert(!anti.contains("UDF"), "bloom probe fell back to a UDF")
    val rows = (1 to 60).flatMap(i => Seq.fill(i)(s"t$i")).toDF("tok")
    rows.write.mode("overwrite").parquet(s"$dir/toks")
    val hh = Membership.heavyHitters(spark.read.parquet(s"$dir/toks"),
        col("tok"), minCount = 40)
      .queryExecution.executedPlan.toString
    assert(hh.contains("cmsatleast") || hh.contains("CmsAtLeast"), hh.take(800))
    assert(!hh.contains("UDF"), "cms probe fell back to a UDF")
  }

  test("udf fallback (nativeExpr=false) produces identical results") {
    def all() = {
      val a = Membership.bloomAntiJoin(big, col("key"), small, col("dkey"),
          expectedItems = 100, fpp = 0.3)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      val s = Membership.bloomSemiJoin(big, col("key"), small, col("dkey"),
          expectedItems = 100, fpp = 0.3)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      val rows = (1 to 60).flatMap(i => Seq.fill(i)(s"t$i")).toDF("tok")
      val h = Membership.heavyHitters(rows, col("tok"), minCount = 40)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      (a, s, h)
    }
    val native = all()
    spark.conf.set("spark.graft.membership.nativeExpr", "false")
    try assert(all() == native)
    finally spark.conf.unset("spark.graft.membership.nativeExpr")
  }
}
