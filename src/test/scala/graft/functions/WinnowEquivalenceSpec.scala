package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.TextOps

/** WinnowF must reproduce the exploded-window winnowing pipeline
  * fingerprint-for-fingerprint. */
class WinnowEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    "the quick brown fox jumps over the lazy dog and the quick cat",
    "a b c d e f g h",
    "short doc",                 // < w tokens: no fingerprints
    "w x y z",                   // exactly w tokens: one window
    "rep rep rep rep rep rep",   // all windows identical: one distinct fp
    ""
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("native fingerprints equal the windowed pipeline for several (w, k)") {
    for ((w, k) <- Seq((4, 4), (3, 2), (5, 8), (1, 3))) {
      val fast = TextOps.winnowFingerprints(docs, "doc_id", "text", w, k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val slow = TextOps.winnowFingerprintsWindowed(docs, "doc_id", "text", w, k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(fast == slow, s"(w=$w, k=$k)")
      assert(fast.nonEmpty)
    }
  }

  test("tokenHash matches conv(substring(md5(s), 1, 12), 16, 10) % P") {
    val words = Seq("alpha", "beta", "", "héllo", "日本語")
    val sqlHashes = words.toDF("s")
      .select((conv(substring(md5(col("s")), 1, 12), 16, 10).cast("long")
        % WinnowF.P).as("h"))
      .collect().map(_.getLong(0)).toSeq
    val jvmHashes = words.map(s =>
      WinnowF.tokenHash(org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    assert(jvmHashes == sqlHashes)
  }

  test("windows containing a null token are dropped, matching lead()") {
    val arr = array(lit("a"), lit(null).cast("string"), lit("b"),
      lit("c"), lit("d"), lit("e"))
    import org.apache.spark.sql.graft.ColumnBridge
    val fps = ColumnBridge.column(
      WinnowF(ColumnBridge.expression(arr), 3, 10))
    val got = spark.range(1).select(fps.as("f")).head.getSeq[Long](0)
    // valid windows: (b c d), (c d e) only — 2 distinct fingerprints
    assert(got.length == 2)
  }
}
