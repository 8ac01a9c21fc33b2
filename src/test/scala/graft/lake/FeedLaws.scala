package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

/** The CDF algebra every `changes(table, fromV, toV)` feed must obey,
  * shared by the example-based and randomized specs. */
object FeedLaws {

  /** Telescoping: fromV's snapshot viewed under toV's column mapping,
    * plus the feed's inserts, minus its deletes, equals toV's snapshot
    * as a bag. Columns the fromV snapshot genuinely predates (added
    * mid-range) null-fill, typed from the feed — the same latest-schema
    * rule `changes` itself applies. */
  def telescopes(store: TableStore, table: String,
                 fromV: Long, toV: Long): Unit = {
    val feed = store.changes(table, fromV, toV)
    val cols = feed.columns.toSeq
      .filterNot(Set("_change_type", "_commit_version"))
    def aligned(df: DataFrame) = df.select(cols.map(c =>
      if (df.columns.contains(c)) col(c)
      else lit(null).cast(feed.schema(c).dataType).as(c)): _*)
    val ins = feed.where(col("_change_type") === "insert")
      .select(cols.map(col): _*)
    val del = feed.where(col("_change_type") === "delete")
      .select(cols.map(col): _*)
    val applied = aligned(store.readVersionAs(table, fromV, toV))
      .unionByName(ins).exceptAll(del)
    val want = aligned(store.readVersionAs(table, toV, toV))
    assert(applied.exceptAll(want).isEmpty && want.exceptAll(applied).isEmpty,
      s"feed does not telescope $fromV -> $toV on $table")
  }
}
