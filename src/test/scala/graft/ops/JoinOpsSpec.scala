package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  test("as-of backward join picks the latest right row at-or-before each left ts") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 10L, "d"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 8L, 1.0), (1L, 10L, 2.0), (1L, 15L, 3.0), (3L, 1L, 9.0))
      .toDF("k", "rts", "rv")
    val out = AsofJoin.backward(left, right, Seq("k"), "ts", "rts", Seq("rv"))
      .orderBy("k", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4))).toSeq
    assert(out == Seq(
      (1L, 5L, "c", -1L, -1.0),   // nothing at-or-before 5
      (1L, 10L, "a", 10L, 2.0),   // inclusive: rts == ts matches
      (1L, 20L, "b", 15L, 3.0),   // latest of {8,10,15}
      (2L, 10L, "d", -1L, -1.0))) // key with no right rows
  }

  test("as-of tolerance nulls out matches older than the bound") {
    val left = Seq((1L, 100L)).toDF("k", "ts")
    val right = Seq((1L, 10L, 7.0)).toDF("k", "rts", "rv")
    val near = AsofJoin.backward(left, right, Seq("k"), "ts", "rts",
      Seq("rv"), toleranceUs = Some(200L)).collect()(0)
    assert(near.getLong(2) == 10L && near.getDouble(3) == 7.0)
    val far = AsofJoin.backward(left, right, Seq("k"), "ts", "rts",
      Seq("rv"), toleranceUs = Some(50L)).collect()(0)
    assert(far.isNullAt(2) && far.isNullAt(3))
  }

  test("as-of plans contain no join operator (union-window formulation), all directions") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 8L, 1.0)).toDF("k", "rts", "rv")
    for ((label, df) <- Seq(
        "backward" -> AsofJoin.backward(left, right, Seq("k"), "ts", "rts", Seq("rv")),
        "forward" -> AsofJoin.forward(left, right, Seq("k"), "ts", "rts", Seq("rv")),
        "nearest" -> AsofJoin.nearest(left, right, Seq("k"), "ts", "rts", Seq("rv")))) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Join"), s"join in the $label as-of plan:\n$p")
      assert(p.contains("Window"), s"no window in the $label as-of plan:\n$p")
    }
  }

  test("range join matches brute-force BETWEEN semantics on half-open intervals") {
    val points = Seq(0L, 5L, 10L, 15L, 99L, 100L, 250L).toDF("p")
    val intervals = Seq((1L, 0L, 10L), (2L, 5L, 100L), (3L, 90L, 300L))
      .toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, intervals, "p", "s", "e",
        bucketWidth = 7L)
      .select("iid", "p").as[(Long, Long)].collect().toSet
    val want = (for {
      (iid, s, e) <- Seq((1L, 0L, 10L), (2L, 5L, 100L), (3L, 90L, 300L))
      p <- Seq(0L, 5L, 10L, 15L, 99L, 100L, 250L) if p >= s && p < e
    } yield (iid, p)).toSet
    assert(got == want)
  }

  test("range join plans an equi-join on the bucket id, not a theta join") {
    val points = spark.range(100).select(col("id").as("p"))
    val intervals = Seq((1L, 0L, 50L)).toDF("iid", "s", "e")
    val p = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"theta join in range-join plan:\n$p")
  }

  test("keyed interval overlap join matches brute-force overlap semantics") {
    val spans = Seq(
      // key 1: [0,10] overlaps [5,20] and touches [10,30] at the bound;
      // [40,50] is disjoint
      ("k1", 1L, 0L, 10L), ("k1", 2L, 5L, 20L), ("k1", 3L, 10L, 30L),
      ("k1", 4L, 40L, 50L),
      // key 2: same ids as key 1 must NOT pair across keys
      ("k2", 1L, 0L, 100L), ("k2", 2L, 60L, 70L)
    ).toDF("k", "id", "s", "e")
    val got = IntervalJoin.selfOverlapPairs(spans, Seq("k"), "id", "s", "e")
      .select("k", "a_id", "b_id", "overlap_start", "overlap_end")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("k1", 1L, 2L, 5L, 10L), ("k1", 1L, 3L, 10L, 10L),
      ("k1", 2L, 3L, 10L, 20L),
      ("k2", 1L, 2L, 60L, 70L)))
  }

  test("keyed interval overlap join is an equi-join on keys, not a theta join") {
    val spans = Seq(("k", 1L, 0L, 10L), ("k", 2L, 5L, 20L))
      .toDF("k", "id", "s", "e")
    val p = IntervalJoin.selfOverlapPairs(spans, Seq("k"), "id", "s", "e")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"theta join in interval-join plan:\n$p")
  }
}
