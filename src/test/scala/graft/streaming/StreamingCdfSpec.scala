package graft.streaming

import graft.SparkSpec
import graft.lake.TableStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The CDF follower must equal a from-scratch rebuild after ANY
  * interleaving of source commits and maintenance ticks, and must be
  * exactly-once under redundant ticks (the crash-replay shape: the
  * cursor advances in the same atomic commit as the data). */
class StreamingCdfSpec extends SparkSpec {
  import spark.implicits._

  private def src(rows: Seq[(Int, Int)]): DataFrame =
    rows.toDF("id", "x").select(col("id"), (col("id") % 5).as("k"), col("x"))

  /** groupBy(k) → (n, s): the canonical incrementally-maintainable
    * aggregate. */
  private def build(df: DataFrame): DataFrame =
    df.groupBy("k").agg(count(lit(1)).as("n"), sum("x").cast("long").as("s"))

  /** Keyed merge of O(delta-groups): inserts add, deletes subtract. */
  private def applyDelta(agg: DataFrame, feed: DataFrame): DataFrame = {
    val sign = when(col("_change_type") === "insert", lit(1)).otherwise(lit(-1))
    val delta = feed.groupBy("k").agg(
      sum(sign.cast("long")).as("dn"),
      sum((sign * col("x")).cast("long")).as("ds"))
    agg.join(delta, Seq("k"), "full_outer")
      .select(col("k"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("s"), lit(0L)) + coalesce(col("ds"), lit(0L))).as("s"))
      .where(col("n") > 0)
  }

  private def contentOf(df: DataFrame): Set[(Int, Long, Long)] =
    df.select("k", "n", "s").as[(Int, Long, Long)].collect().toSet

  test("streamed maintenance equals from-scratch rebuild across interleaved commits") {
    val store = new TableStore(spark, tmpDir("cdf-follow"))
    store.create("events", src((0 until 60).map(i => (i, i * 10))))
    StreamingCdf.bootstrap(store, "events", "agg", build)

    def assertCaughtUpAndEqual(): Unit = {
      val expect = contentOf(build(store.read("events")))
      assert(contentOf(store.read("agg")) == expect,
        "maintained aggregate diverged from rebuild")
    }
    assertCaughtUpAndEqual()

    // append → tick
    store.append("events", src((60 until 90).map(i => (i, i * 10))))
    assert(StreamingCdf.tick(store, "events", "agg", applyDelta))
    assertCaughtUpAndEqual()

    // merge-on-read delete+insert → tick (append-only manifest path)
    store.appendWithDeletes("events",
      src(Seq((100, 7), (101, 7))),
      (0 until 30 by 3).toDF("id"))
    assert(StreamingCdf.tick(store, "events", "agg", applyDelta))
    assertCaughtUpAndEqual()

    // several commits between ticks → one catchUp drains them all
    store.append("events", src(Seq((200, 1))))
    store.appendWithDeletes("events", src(Seq((201, 2))), Seq(100).toDF("id"))
    assert(StreamingCdf.catchUp(store, "events", "agg", applyDelta) == 1)
    assertCaughtUpAndEqual()

    // a rewrite (overwrite) exercises the bag-diff fallback feed
    store.overwrite("events",
      store.read("events").where(col("id") % 2 === 0))
    assert(StreamingCdf.tick(store, "events", "agg", applyDelta))
    assertCaughtUpAndEqual()

    // caught up: redundant ticks are no-ops (at-least-once replays
    // collapse — the cursor rode the last commit)
    val vBefore = store.currentVersion("agg").get
    assert(!StreamingCdf.tick(store, "events", "agg", applyDelta))
    assert(store.currentVersion("agg").get == vBefore)
  }

  test("cursor survives foreign commits to the target and bootstrap races") {
    val store = new TableStore(spark, tmpDir("cdf-follow2"))
    store.create("events", src(Seq((1, 10), (2, 20))))
    StreamingCdf.bootstrap(store, "events", "agg", build)
    // a foreign (non-follower) commit on the target: the cursor scan
    // walks back past it to the last txn commit
    store.append("agg", Seq((99, 0L, 0L)).toDF("k", "n", "s"))
    store.append("events", src(Seq((3, 30))))
    assert(StreamingCdf.tick(store, "events", "agg", applyDelta))
    // the follower's overwrite replaced the foreign row wholesale —
    // content equals rebuild again
    assert(contentOf(store.read("agg")) ==
      contentOf(build(store.read("events"))))
    // un-bootstrapped target fails loudly
    val e = intercept[IllegalStateException] {
      StreamingCdf.tick(store, "events", "other", applyDelta)
    }
    assert(e.getMessage.contains("bootstrap"))
  }

  test("lastTxn: newest wins, survives unrelated commits, vacuum-safe in steady state") {
    val store = new TableStore(spark, tmpDir("cdf-txn"))
    store.createTxn("t", Seq((1, "a")).toDF("id", "v"), "app", 5L)
    assert(store.lastTxn("t", "app").contains(5L))
    store.append("t", Seq((2, "b")).toDF("id", "v")) // no txn
    assert(store.lastTxn("t", "app").contains(5L))
    store.overwriteTxn("t", Seq((3, "c")).toDF("id", "v"), "app", 9L)
    assert(store.lastTxn("t", "app").contains(9L))
    assert(store.lastTxn("t", "otherapp").isEmpty)
    // steady state: the latest txn rides the CURRENT manifest, so
    // vacuuming history keeps the cursor
    store.vacuum("t", keep = 1)
    assert(store.lastTxn("t", "app").contains(9L))
  }
}
