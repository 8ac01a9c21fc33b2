package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join on the bucket key plans with NO shuffle exchange") {
    val li = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Bucketing.writeBucketed(li, "b_lineitem", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "b_orders", "l_orderkey", 8)
    try {
      val joined = Bucketing.bucketJoin(spark, "b_lineitem", "b_orders",
        "l_orderkey")
      joined.collect() // finalize adaptive plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // same result as the plain join
      val plain = li.join(o, Seq("l_orderkey")).count()
      assert(joined.count() == plain)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("bucketed aggregation on the bucket key avoids the shuffle") {
    val li = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_quantity")
    Bucketing.writeBucketed(li, "b_li2", "l_orderkey", 8)
    try {
      val agg = spark.table("b_li2").groupBy("l_orderkey")
        .agg(sum("l_quantity").as("q"))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed agg still shuffles:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS b_li2")
  }
}
