package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized (seeded, deterministic) check of the union-window as-of
  * join against a naive in-memory reference: for every left row, the
  * right row of the same key with the greatest rts <= ts. Right rows
  * are unique per (key, rts) per the operator's contract. */
class AsofPropertySpec extends SparkSpec {
  import spark.implicits._

  test("as-of join equals the brute-force reference on random inputs") {
    val rnd = new scala.util.Random(11L)
    for (round <- 1 to 5) {
      val keys = 1L to (1 + rnd.nextInt(4))
      val left = (1 to 30).map(i =>
        (keys(rnd.nextInt(keys.size)), rnd.nextInt(100).toLong, i.toLong))
      val right = rnd.shuffle(
        (for (k <- keys; t <- 0 to 99 if rnd.nextBoolean() && rnd.nextBoolean())
          yield (k, t.toLong, rnd.nextDouble())).toList)

      val got = AsofJoin.backward(
          left.toDF("k", "ts", "tag"), right.toDF("k", "rts", "rv"),
          Seq("k"), "ts", "rts", Seq("rv"))
        .select("k", "ts", "tag", "rts")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toSeq.sorted

      // sorted Seqs, not Sets: a duplicate-emitting regression in the
      // union-window plan must fail the cardinality comparison
      val want = left.map { case (k, ts, tag) =>
        val m = right.filter(r => r._1 == k && r._2 <= ts)
        (k, ts, tag, if (m.isEmpty) None else Some(m.map(_._2).max))
      }.sorted

      assert(got == want, s"round $round mismatch")
    }
  }

  test("forward and nearest equal the brute-force reference (with tolerance)") {
    val rnd = new scala.util.Random(23L)
    for (round <- 1 to 5) {
      val keys = 1L to (1 + rnd.nextInt(4))
      val left = (1 to 30).map(i =>
        (keys(rnd.nextInt(keys.size)), rnd.nextInt(100).toLong, i.toLong))
      val right = rnd.shuffle(
        (for (k <- keys; t <- 0 to 99 if rnd.nextBoolean() && rnd.nextBoolean())
          yield (k, t.toLong, rnd.nextDouble())).toList)
      val tol = if (round % 2 == 0) Some(15L) else None
      def ok(d: Long) = tol.forall(d <= _)

      val gotF = AsofJoin.forward(
          left.toDF("k", "ts", "tag"), right.toDF("k", "rts", "rv"),
          Seq("k"), "ts", "rts", Seq("rv"), toleranceUs = tol)
        .select("k", "ts", "tag", "rts").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq.sorted
      val wantF = left.map { case (k, ts, tag) =>
        val m = right.filter(r => r._1 == k && r._2 >= ts && ok(r._2 - ts))
        (k, ts, tag, if (m.isEmpty) None else Some(m.map(_._2).min))
      }.sorted
      assert(gotF == wantF, s"forward round $round mismatch")

      val gotN = AsofJoin.nearest(
          left.toDF("k", "ts", "tag"), right.toDF("k", "rts", "rv"),
          Seq("k"), "ts", "rts", Seq("rv"), toleranceUs = tol)
        .select("k", "ts", "tag", "rts", "asof_dir").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          Option(r.getString(4)))).toSeq.sorted
      val wantN = left.map { case (k, ts, tag) =>
        val b = right.filter(r => r._1 == k && r._2 <= ts && ok(ts - r._2))
          .map(_._2).maxOption
        val f = right.filter(r => r._1 == k && r._2 >= ts && ok(r._2 - ts))
          .map(_._2).minOption
        (b, f) match {
          case (Some(bb), Some(ff)) if ts - bb <= ff - ts =>
            (k, ts, tag, Some(bb), Some("backward")) // ties -> backward
          case (_, Some(ff)) if b.isEmpty || ts - b.get > ff - ts =>
            (k, ts, tag, Some(ff), Some("forward"))
          case (Some(bb), None) => (k, ts, tag, Some(bb), Some("backward"))
          case _ => (k, ts, tag, None, None)
        }
      }.sorted
      assert(gotN == wantN, s"nearest round $round mismatch")
    }
  }
}
