package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.TextOps

/** The native NgramsF expression must be bit-identical to the HOF
  * fold it replaced, across every edge the fold had. */
class NgramEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b",
    "solo",
    "",
    "  ",            // tokens() of blank-ish text
    "x y z",
    "repeat repeat repeat repeat",
    "ends with spaces  ",
    "one"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")

  test("native n-grams equal the HOF fold for n = 1..5 on real token arrays") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      for (n <- 1 to 5) {
        val toks = TextOps.tokens(col("text"))
        val bad = texts.select(
            TextOps.ngramsOfTokens(toks, n).as("fast"),
            TextOps.ngramsOfTokensHof(toks, n).as("slow"))
          .where(not(col("fast") <=> col("slow")))
        assert(bad.isEmpty, s"n=$n: ${bad.collect().toSeq}")
      }
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("null tokens propagate into grams exactly like the fold") {
    val arr = array(lit("a"), lit(null).cast("string"), lit("b"), lit("c"))
    for (n <- 1 to 3) {
      val r = spark.range(1).select(
        TextOps.ngramsOfTokens(arr, n).as("fast"),
        TextOps.ngramsOfTokensHof(arr, n).as("slow"))
        .where(not(col("fast") <=> col("slow")))
      assert(r.isEmpty, s"n=$n")
    }
    // short-array path with nulls: concat_ws skips them
    val short = array(lit(null).cast("string"), lit("q"))
    val r3 = spark.range(1).select(
      TextOps.ngramsOfTokens(short, 3).as("fast"),
      TextOps.ngramsOfTokensHof(short, 3).as("slow")).head
    assert(r3.getSeq[String](0) == Seq("q") && r3.getSeq[String](1) == Seq("q"))
  }

  test("null array in, EMPTY out (matching the HOF fold); empty array degrades to no grams") {
    val nullArr = lit(null).cast("array<string>")
    val r = spark.range(1).select(
      TextOps.ngramsOfTokens(nullArr, 2).as("f0"),
      TextOps.ngramsOfTokens(array().cast("array<string>"), 2).as("f1"),
      TextOps.ngramsOfTokensHof(nullArr, 2).as("slow")).head
    // the fold never produced null (its when/otherwise falls through
    // to an empty filtered array) — the native wrapper must agree
    assert(r.getSeq[String](0).isEmpty && r.getSeq[String](1).isEmpty)
    assert(r.getSeq[String](2).isEmpty, "HOF reference changed shape")
  }
}
