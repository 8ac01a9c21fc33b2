package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import Expectations.Rule

  test("violating rows quarantine with their failed rule names; clean rows commit") {
    val store = new TableStore(spark, tmpDir("exp"))
    val batch = Seq(
      (1L, 5.0, "a"),   // clean
      (2L, -1.0, "a"),  // fails balance
      (3L, 5.0, "zz"),  // fails segment
      (4L, -2.0, "zz")) // fails both
      .toDF("id", "bal", "seg")
    val out = Expectations.ingest(store, "t", batch, Seq(
      Rule("bal_nonneg", col("bal") >= 0),
      Rule("seg_known", col("seg").isin("a", "b"))))
    assert(out == Expectations.Outcome(1L, 3L))
    assert(store.read("t").select("id").as[Long].collect().toSeq == Seq(1L))
    val quar = store.read("t_quarantine")
      .select(col("id"), col("failed_rules"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).sorted).toMap
    assert(quar == Map(
      2L -> Seq("bal_nonneg"),
      3L -> Seq("seg_known"),
      4L -> Seq("bal_nonneg", "seg_known")))
  }

  test("a NULL predicate result is a violation (strict), not a pass") {
    val store = new TableStore(spark, tmpDir("exp"))
    val batch = Seq((1L, Some(5.0)), (2L, Option.empty[Double]))
      .toDF("id", "bal")
    val out = Expectations.ingest(store, "tn", batch,
      Seq(Rule("bal_nonneg", col("bal") >= 0)))
    assert(out == Expectations.Outcome(1L, 1L))
    assert(store.read("tn_quarantine").select("id").as[Long]
      .collect().toSeq == Seq(2L))
  }

  test("an all-clean batch creates no quarantine table; all-bad commits nothing") {
    val store = new TableStore(spark, tmpDir("exp"))
    val clean = Expectations.ingest(store, "tc",
      Seq((1L, 1.0)).toDF("id", "bal"),
      Seq(Rule("r", col("bal") > 0)))
    assert(clean == Expectations.Outcome(1L, 0L))
    assert(!store.exists("tc_quarantine"))
    val bad = Expectations.ingest(store, "tb",
      Seq((1L, -1.0)).toDF("id", "bal"),
      Seq(Rule("r", col("bal") > 0)))
    assert(bad == Expectations.Outcome(0L, 1L))
    assert(!store.exists("tb"))
  }

  test("ingest is atomic across table and quarantine: a failing side unwinds both") {
    val store = new TableStore(spark, tmpDir("exp"))
    store.create("ta", Seq((0L, 1.0)).toDF("id", "bal"))
    // poison the QUARANTINE side: its CHECK constraint rejects exactly
    // the rows this batch would quarantine, so the second staged
    // append aborts inside the transaction
    store.create("ta_quarantine",
      Seq((-1L, 1.0, Array("seed"))).toDF("id", "bal", "failed_rules"))
    store.addConstraint("ta_quarantine", "bal_pos", "bal > -900")
    intercept[IllegalArgumentException] {
      Expectations.ingest(store, "ta",
        Seq((1L, 5.0), (2L, -999.0)).toDF("id", "bal"),
        Seq(Rule("bal_nonneg", col("bal") >= 0)))
    }
    assert(!store.inTransaction)
    // NEITHER side changed: the accepted row did not publish either
    assert(store.read("ta").count() == 1)
    assert(store.read("ta_quarantine").count() == 1)
    assert(store.currentVersion("ta").contains(0L))
    // with the poison pill removed the same batch lands atomically
    store.dropConstraint("ta_quarantine", "bal_pos")
    val out = Expectations.ingest(store, "ta",
      Seq((1L, 5.0), (2L, -999.0)).toDF("id", "bal"),
      Seq(Rule("bal_nonneg", col("bal") >= 0)))
    assert(out == Expectations.Outcome(1L, 1L))
    assert(store.read("ta").count() == 2)
    assert(store.read("ta_quarantine").count() == 2)
  }
}
