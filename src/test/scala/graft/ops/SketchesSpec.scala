package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("KMV estimate is within expected error of the exact count") {
    val df = spark.range(10000).select((col("id") % 3000).as("v"))
    val est = Sketches.kmvDistinct(df, Seq.empty, "v", k = 64)
      .select("est_distinct").as[Double].head()
    // stderr ~ 1/sqrt(k-2) ~ 12.7%; 3-sigma bound
    assert(math.abs(est - 3000) / 3000 < 0.4, s"estimate $est vs 3000")
  }

  test("small cardinalities are exact") {
    val df = Seq(1, 2, 3, 2, 1).toDF("v")
    val est = Sketches.kmvDistinct(df, Seq.empty, "v", k = 64)
      .select("est_distinct").as[Double].head()
    assert(est == 3.0)
  }

  test("merging partition sketches is lossless vs sketching the whole") {
    val k = 32
    val df = spark.range(5000).select((col("id") * 7919 % 4001).as("v"))
    val a = Sketches.kmvSketch(df.where(col("v") % 2 === 0), "v", k)
    val b = Sketches.kmvSketch(df.where(col("v") % 2 =!= 0), "v", k)
    val whole = Sketches.kmvSketch(df, "v", k)
    assert(Sketches.kmvMerge(Seq(a, b), k) == whole)
    // and the merged estimate equals the whole-frame estimate
    assert(Sketches.kmvEstimate(Sketches.kmvMerge(Seq(a, b), k), k) ==
      Sketches.kmvEstimate(whole, k))
  }
}
