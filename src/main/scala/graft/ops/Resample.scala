package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series resampling to a regular grid with last-observation-
  * carried-forward — the gap-filling step every telemetry/feature
  * pipeline needs before windowed modeling (Flink's interval fill,
  * QuestDB/kdb `fill(prev)`).
  *
  * Scale shape: the grid is `distinct keys × sequence(t0, t1, step)` —
  * one distinct-shuffle plus a narrow explode, rows = keys × buckets
  * (bounded by construction, never data × data). The fill itself is
  * [[AsofJoin.backward]]'s union-window form: ONE shuffle on the key,
  * no join operator, per-key memory O(1) — so a 100 TB observation
  * table resamples at sort-merge-join cost.
  */
object Resample {

  /** Per-key grid over [t0Us, t1Us] at `stepUs` (inclusive of aligned
    * endpoints), `valueCol` forward-filled from the most recent
    * observation at or before each bucket; buckets before a key's
    * first observation stay null. Ties at one (key, ts) resolve to
    * max(value) — deterministic on any partitioning. */
  def ffillGrid(obs: DataFrame, keys: Seq[String], tsUs: String,
                valueCol: String, stepUs: Long, t0Us: Long,
                t1Us: Long): DataFrame = {
    val grid = obs.select(keys.map(col): _*).distinct()
      .withColumn("bucket_us",
        explode(expr(s"sequence(${t0Us}L, ${t1Us}L, ${stepUs}L)")))
    val dedup = obs.groupBy(keys.map(col) :+ col(tsUs): _*)
      .agg(max(valueCol).as(valueCol))
    AsofJoin.backward(grid, dedup, keys, "bucket_us", tsUs, Seq(valueCol))
  }
}
