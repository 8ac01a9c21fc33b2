package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("blocked fuzzy pairs: matches inside blocks only, with support counts") {
    val df = Seq(
      "acme corp", "acme corp", "acme corp",    // support 3
      "acmee corp",                             // dist 1 from acme corp
      "ace corp",                               // dist 2 from acme corp
      "acme inc",                               // different block (noun)
      "zenith corp"                             // same block, too far
    ).toDF("name")
    val pairs = Linkage
      .blockedFuzzyPairs(df, "name", n => split(n, " ").getItem(1), maxDist = 2)
      .orderBy("name_a", "name_b")
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getInt(2), r.getLong(3), r.getLong(4)))
    // "acme inc" is blocked away (noun 'inc'); "zenith corp" is in the
    // 'corp' block but beyond distance 2 from everything.
    assert(pairs.map(t => (t._1, t._2)).toSet == Set(
      ("ace corp", "acme corp"),
      ("ace corp", "acmee corp"),
      ("acme corp", "acmee corp")))
    assert(pairs.forall(_._3 <= 2))
    val support = pairs.find(t => t._1 == "ace corp" && t._2 == "acme corp").get
    assert(support._4 == 1L && support._5 == 3L)
  }

  test("blocked fuzzy pairs plan: equi-join on the block key, no theta/cartesian join") {
    val df = Seq("red bolt", "red colt", "blue bolt").toDF("name")
    val p = Linkage
      .blockedFuzzyPairs(df, "name", n => split(n, " ").getItem(1), maxDist = 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"fuzzy match must candidate-generate via the block equi-join:\n$p")
  }
}
