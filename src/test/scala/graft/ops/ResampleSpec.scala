package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  test("ffillGrid carries the last observation forward per key, nulls before first") {
    // key a: obs at t=10 (v=1.0) and t=25 (v=2.0); key b: obs at t=22 only
    val obs = Seq(("a", 10L, 1.0), ("a", 25L, 2.0), ("b", 22L, 9.0))
      .toDF("k", "ts", "v")
    val out = Resample.ffillGrid(obs, Seq("k"), "ts", "v",
        stepUs = 10L, t0Us = 0L, t1Us = 30L)
      .select("k", "bucket_us", "v")
      .orderBy("k", "bucket_us").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(out.toSeq == Seq(
      ("a", 0L, None), ("a", 10L, Some(1.0)), ("a", 20L, Some(1.0)),
      ("a", 30L, Some(2.0)),
      ("b", 0L, None), ("b", 10L, None), ("b", 20L, None),
      ("b", 30L, Some(9.0))))
  }

  test("ties at one (key, ts) resolve to max(value) deterministically") {
    val obs = Seq(("a", 10L, 3.0), ("a", 10L, 7.0)).toDF("k", "ts", "v")
    val out = Resample.ffillGrid(obs, Seq("k"), "ts", "v", 10L, 10L, 10L)
      .select("v").head.getDouble(0)
    assert(out == 7.0)
  }

  test("plan is join-free: grid fill uses the union-window form") {
    val obs = Seq(("a", 10L, 1.0)).toDF("k", "ts", "v")
    val p = Resample.ffillGrid(obs, Seq("k"), "ts", "v", 10L, 0L, 20L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of fill grew a join operator:\n$p")
  }
}
