package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-stage aggregation equals plain groupBy") {
    // 90% of rows land on one hot key
    val df = spark.range(10000)
      .select(when(col("id") % 10 === 0, col("id") % 7).otherwise(0L).as("k"),
        (col("id") % 100).cast("double").as("v"))
    val plain = df.groupBy("k").agg(sum("v").as("sum_value"), count(lit(1)).as("n"))
      .orderBy("k").as[(Long, Double, Long)].collect().toSeq
    val salted = Skew.saltedSumCount(df, "k", "v")
      .orderBy("k").as[(Long, Double, Long)].collect().toSeq
    assert(salted == plain)
  }

  test("salted join equals plain join") {
    val fact = spark.range(5000)
      .select((col("id") % 3).as("k"), col("id").as("x"))
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d")).toDF("k", "name")
    val plain = fact.join(dim, "k").groupBy("name").count()
      .orderBy("name").as[(String, Long)].collect().toSeq
    val salted = Skew.saltedJoin(fact, dim, "k").groupBy("name").count()
      .orderBy("name").as[(String, Long)].collect().toSeq
    assert(salted == plain)
  }
}
