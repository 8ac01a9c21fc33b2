package graft.streaming

import graft.lake.TableStore
import org.apache.spark.sql.DataFrame

/** Continuous consumption of a table's change data feed: a downstream
  * aggregate (or any derived table) is maintained purely from
  * `TableStore.changes` deltas, micro-batch by micro-batch — the base
  * table is never rescanned after bootstrap, which is the whole point
  * of a CDF at 100 TB (Delta's `readStream` on a table feeding
  * `foreachBatch` incremental maintenance, re-expressed on the graft
  * store).
  *
  * Exactly-once without a checkpoint directory: each tick's output
  * commit carries the new cursor as a `#txn=` manifest header in the
  * SAME atomic commit ([[TableStore.overwriteTxn]] — Delta's
  * SetTransaction idempotence). A crash before the commit changes
  * nothing (the next tick re-pulls the same feed); a crash after it
  * finds the advanced cursor via [[TableStore.lastTxn]]. There is no
  * state in this object — every tick recovers everything it needs
  * from the store, so the follower survives restarts, concurrent
  * followers of different targets, and interleaved foreign commits to
  * the target (the cursor scan walks back to the last txn commit).
  *
  * The loop is driver-side polling (`tick` per micro-batch, `catchUp`
  * to drain): the feed's source of truth is manifest versions, so
  * "new data" detection is one metadata read — no always-on cluster
  * job between commits, the same schedule-or-trigger shape as a Delta
  * maintenance job.
  */
object StreamingCdf {

  // ':' is the txn header's app/version delimiter — not usable here
  private def appId(source: String) = s"cdf-$source"

  /** Bootstrap the maintained table: one full build of `target` from
    * the source's CURRENT version, with the cursor pinned to that
    * same version in the same commit — a commit racing the bootstrap
    * lands above the pin and is picked up by the first tick, never
    * skipped. */
  def bootstrap(store: TableStore, source: String, target: String,
                build: DataFrame => DataFrame): Unit = {
    val cur = store.currentVersion(source).getOrElse(
      throw new IllegalStateException(s"source table $source does not exist"))
    store.createTxn(target, build(store.readVersion(source, cur)),
      appId(source), cur)
  }

  /** One maintenance micro-batch: pull the feed since the recorded
    * cursor, apply it, advance the cursor — one atomic commit.
    * Returns false when already caught up (nothing committed).
    *
    * `applyDelta(current, feed)` must return the full new content of
    * `target` — typically a keyed merge of O(delta-groups) against
    * the current aggregate, never a rescan of `source`. */
  def tick(store: TableStore, source: String, target: String,
           applyDelta: (DataFrame, DataFrame) => DataFrame): Boolean = {
    val cursor = store.lastTxn(target, appId(source)).getOrElse(
      throw new IllegalStateException(
        s"$target has no cursor for $source — bootstrap first " +
          "(or its txn commits were all vacuumed)"))
    store.changesSince(source, cursor) match {
      case None => false
      case Some((feed, next)) =>
        store.overwriteTxn(target, applyDelta(store.read(target), feed),
          appId(source), next)
        true
    }
  }

  /** Drain the feed: tick until caught up. Returns ticks applied. */
  def catchUp(store: TableStore, source: String, target: String,
              applyDelta: (DataFrame, DataFrame) => DataFrame): Int = {
    var n = 0
    while (tick(store, source, target, applyDelta)) n += 1
    n
  }
}
