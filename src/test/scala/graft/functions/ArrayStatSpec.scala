package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.TextOps

class ArrayStatSpec extends SparkSpec {
  import spark.implicits._

  private def withForcedCodegen[A](body: => A): A = {
    // surface Janino errors instead of silently degrading to eval
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try body finally {
      spark.conf.set("spark.sql.codegen.fallback", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  private lazy val docs = Seq(
    "a a a b c",
    "x y x y x y x y",
    "one two three",
    "solo",
    "",
    "t t",
    "p q p q r r r r r"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")

  test("graft_max_mult equals the sort+fold HOF on tokens, bigrams, trigrams") {
    GraftFunctions.register(spark)
    withForcedCodegen {
      for (n <- 1 to 3) {
        val arr = TextOps.ngramsOfTokens(TextOps.tokens(col("text")), n)
        val bad = docs
          .select(GraftFunctions.maxMultF(arr).as("fast"),
            TextOps.maxMultiplicity(arr).as("slow"))
          .where(col("fast") =!= col("slow"))
        assert(bad.isEmpty, s"n=$n: ${bad.collect().mkString}")
      }
    }
  }

  test("graft_ndistinct equals size(array_distinct()), incl. null elements") {
    GraftFunctions.register(spark)
    withForcedCodegen {
      val arr = when(col("id") === 3, lit(null).cast("array<string>"))
        .otherwise(concat(TextOps.tokens(col("text")),
          array(lit(null).cast("string"), lit(null).cast("string"))))
      val r = docs.select(
        GraftFunctions.nDistinctF(arr).as("fast"),
        size(array_distinct(arr)).cast("long").as("slow"))
      // array_distinct keeps one null; the hash-set counts one null key
      assert(r.where(col("fast") =!= col("slow")).isEmpty)
      // null array in -> null out on both
      assert(r.where(col("fast").isNull =!= col("slow").isNull).isEmpty)
    }
  }

  test("graft_max_mult counts null elements as one run (HOF parity)") {
    GraftFunctions.register(spark)
    withForcedCodegen {
      val arr = array(lit("a"), lit(null).cast("string"),
        lit(null).cast("string"), lit(null).cast("string"), lit("a"))
      val r = spark.range(1).select(
        GraftFunctions.maxMultF(arr).as("fast"),
        TextOps.maxMultiplicity(arr).as("slow")).head
      assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    }
  }

  test("two instances in one projection keep distinct codegen state") {
    GraftFunctions.register(spark)
    withForcedCodegen {
      val r = docs.where(col("id") === 6).select(
        GraftFunctions.maxMultF(TextOps.tokens(col("text"))).as("m1"),
        GraftFunctions.maxMultF(
          TextOps.ngramsOfTokens(TextOps.tokens(col("text")), 2)).as("m2"),
        GraftFunctions.nDistinctF(TextOps.tokens(col("text"))).as("d1")).head
      // "p q p q r r r r r": top token r x5; top bigram "r r" x4; 3 distinct
      assert(r.getLong(0) == 5L && r.getLong(1) == 4L && r.getLong(2) == 3L)
    }
  }
}
