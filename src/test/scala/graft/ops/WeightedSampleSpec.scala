package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) =
    (1 to n).map(i => (i.toLong, "s", 1.0 + (i % 7))).toDF("id", "g", "w")

  test("selection is identical across partitionings (hash-keyed, no RNG)") {
    val df = corpus(500)
    def ids(parts: Int): Seq[Long] =
      Sampling.weightedSample(df.repartition(parts), "g", "id",
          col("w"), n = 50, salt = "t1")
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(1) == ids(13))
  }

  test("returns exactly n per stratum and inclusion follows weight") {
    // one row with overwhelming weight must always win a slot: its
    // exponential key -ln(u)/w collapses toward 0 as w grows
    val df = corpus(300)
      .union(Seq((9999L, "s", 1e12)).toDF("id", "g", "w"))
    val picked = Sampling.weightedSample(df, "g", "id", col("w"),
        n = 20, salt = "t2")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(picked.size == 20)
    assert(picked.contains(9999L), "overwhelming weight not selected")
    // and heavier rows win more slots than lighter ones overall
    val byWeight = Sampling.weightedSample(corpus(2000), "g", "id",
        col("w"), n = 400, salt = "t3")
      .groupBy("w").count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(byWeight(7.0) > byWeight(1.0),
      s"weight-7 rows should beat weight-1 rows: $byWeight")
  }

  test("strata are independent: each language-like group fills its own quota") {
    val df = (1 to 100).map(i => (i.toLong, s"g${i % 4}", 1.0))
      .toDF("id", "g", "w")
    val counts = Sampling.weightedSample(df, "g", "id", col("w"),
        n = 10, salt = "t4")
      .groupBy("g").count().collect().map(_.getLong(1)).toSeq
    assert(counts == Seq(10L, 10L, 10L, 10L))
  }

  test("null/non-positive weights and null ids are dropped, never sampled") {
    // a NULL weight makes the sort key NULL; ascending NULLS-FIRST
    // would hand such rows every slot — the guard must drop them
    val df = corpus(50)
      .union(Seq((8001L, "s", Double.NaN)).toDF("id", "g", "w")
        .withColumn("w", lit(null).cast("double")))
      .union(Seq((8002L, "s", 0.0), (8003L, "s", -3.0)).toDF("id", "g", "w"))
      .union(Seq((0L, "s", 5.0)).toDF("id", "g", "w")
        .withColumn("id", lit(null).cast("long")))
    val picked = Sampling.weightedSample(df, "g", "id", col("w"),
        n = 10, salt = "t5")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(picked.size == 10)
    assert(!picked.exists(Set(8001L, 8002L, 8003L)),
      s"null/zero/negative-weight rows must not win slots: $picked")
  }
}
