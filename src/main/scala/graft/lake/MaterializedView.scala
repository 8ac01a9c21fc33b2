package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate materialized views over a
  * [[TableStore]] table — the change-data-feed consumer
  * `TableStore.changes` was built for (its doc: "an incremental
  * materialized view reads the feed, not the table").
  *
  * Scope: GROUP BY views with self-maintainable aggregates —
  * `count(*)` and `sum(col)` — the pair that folds under BOTH insert
  * and delete (count ± 1, sum ± x); `avg` derives as sum/count at
  * read. min/max are deliberately out: a deleted extremum can't be
  * repaired from a delta, it needs a rescan of the group.
  *
  * Storage model is merge-on-read, mirroring the store's own delete
  * philosophy: the MV table holds PARTIAL-aggregate rows
  * (group cols, `__cnt`, `sum_<col>`...), each refresh APPENDS one
  * batch of signed deltas folded from the source's change feed —
  * O(changed data) per refresh, never O(source) — and [[read]] is a
  * tiny groupBy over the partials (O(MV), not O(source)).
  * [[compactPartials]] folds the accumulated partials back to one row
  * per group. At 100 TB this is the only viable shape: a view over a
  * daily-append corpus refreshes at the cost of the day's data, and
  * serves at the cost of the view.
  *
  * Freshness binding reuses the store's app-transaction watermark
  * (Delta SetTransaction semantics, same discipline as the vector
  * indexes' CDF sync): the version of the SOURCE folded so far rides
  * the MV's own manifest under app id `mv-sync:<src>`, committed in
  * the SAME atomic append as the delta rows — so refresh is
  * exactly-once under crash redelivery (a replayed version no-ops)
  * and concurrent refreshers serialize through the snapshot check
  * (the loser retries against the winner's watermark).
  *
  * The view definition (source table, group cols, sum cols) persists
  * in a 1-row companion table `<mv>__def`, so refresh/read/compact
  * need only the MV name across sessions.
  *
  * Reference behavior context: the reference's engines delegate this
  * to warehouse MVs; this is the from-scratch analog over the store's
  * own change feed.
  */
object MaterializedView {

  private def defTable(mv: String): String = mv + "__def"
  // no ':' — the txn header encodes app:version with ':' reserved
  private def appId(src: String): String = s"mv-sync-$src"
  private[lake] val CntCol = "__cnt"
  private def sumCol(c: String): String = "sum_" + c

  private final case class Def(src: String, groupCols: Seq[String],
                               sumCols: Seq[String],
                               filterSql: Option[String]) {
    /** Apply the view's WHERE to a batch of source-shaped rows — the
      * initial fold and every feed fold MUST go through this, or a
      * filtered view would fold rows it never admitted. */
    def admitted(rows: DataFrame): DataFrame =
      filterSql.fold(rows)(f => rows.where(expr(f)))
  }

  private def loadDef(store: TableStore, mv: String): Def = {
    val r = store.read(defTable(mv)).collect() match {
      case Array(row) => row
      case rows => throw new IllegalStateException(
        s"$mv is not a materialized view (definition rows: ${rows.length})")
    }
    def split(s: String) = s.split(",").toSeq.filter(_.nonEmpty)
    Def(r.getAs[String]("src"), split(r.getAs[String]("group_cols")),
      split(r.getAs[String]("sum_cols")),
      Option(r.getAs[String]("filter_sql")).filter(_.nonEmpty))
  }

  /** Signed partial rows for one batch: per group, `__cnt` = Σ sign
    * and `sum_<c>` = Σ c·sign. NULL measure values vanish from the
    * sum on both the +1 and the -1 side (same row, same NULL), so
    * insert/delete pairs cancel exactly. */
  private def partials(rows: DataFrame, d: Def, sign: Column): DataFrame =
    rows.groupBy(d.groupCols.map(col): _*)
      .agg(sum(sign).as(CntCol),
        d.sumCols.map(c => sum(col(c) * sign).as(sumCol(c))): _*)

  /** Create `mv` = SELECT groupCols, count(*), sum(sumCols...) FROM
    * `src` [WHERE filter] GROUP BY groupCols, bound to `src`'s CURRENT
    * version, as one initial full fold + the watermark in one atomic
    * create. A `filter` (Spark SQL over source columns) stays
    * self-maintainable: the feed's insert AND delete images pass the
    * same predicate, so rows the view never admitted can't be
    * subtracted. Returns the bound source version. */
  def create(store: TableStore, mv: String, src: String,
             groupCols: Seq[String], sumCols: Seq[String],
             filter: Option[String] = None): Long = {
    require(groupCols.nonEmpty, "at least one group column")
    val spark = store.spark
    import spark.implicits._
    val v = store.currentVersion(src).getOrElse(
      throw new IllegalStateException(s"table $src does not exist"))
    val d = Def(src, groupCols, sumCols, filter)
    store.create(defTable(mv),
      Seq((src, groupCols.mkString(","), sumCols.mkString(","),
        filter.getOrElse("")))
        .toDF("src", "group_cols", "sum_cols", "filter_sql"))
    val base = partials(d.admitted(store.readVersion(src, v)), d, lit(1L))
    store.createTxn(mv, base.coalesce(4), appId(src), v)
    v
  }

  /** Fold `src`'s change feed since the last refresh into `mv` as ONE
    * atomic append of signed partial rows — O(changed data). Returns
    * the source version now bound (unchanged if already current).
    * Crash-safe: redelivery of an already-folded version no-ops via
    * the txn guard; a concurrent refresher landing first trips the
    * snapshot check and this call retries from the new watermark. */
  def refresh(store: TableStore, mv: String): Long = {
    val d = loadDef(store, mv)
    var attempts = 0
    while (true) {
      attempts += 1
      val bound = store.lastTxn(mv, appId(d.src)).getOrElse(
        throw new IllegalStateException(
          s"$mv carries no mv-sync watermark for ${d.src} — not a " +
            "materialized view of it, or its binding commit was vacuumed"))
      val cur = store.currentVersion(d.src).getOrElse(
        throw new IllegalStateException(s"table ${d.src} does not exist"))
      if (cur <= bound) return bound
      val mvSnap = store.currentVersion(mv)
      val sign = when(col("_change_type") === "insert", lit(1L))
        .otherwise(lit(-1L))
      val delta = partials(
        d.admitted(store.changes(d.src, bound, cur)
          .drop("_commit_version")), d, sign)
      try {
        // the delta may be EMPTY (a neutral-rewrite range: OPTIMIZE /
        // compact on the source) — commit it anyway so the watermark
        // advances and the next refresh doesn't re-walk the range
        store.appendTxn(mv, delta.coalesce(4), appId(d.src), cur,
          readSnapshot = mvSnap)
        return cur
      } catch {
        case _: SnapshotConflictException if attempts < 5 => // retry
      }
    }
    sys.error("unreachable")
  }

  /** The view's consolidated rows: one row per surviving group —
    * group cols, `cnt` (count(*)) and `sum_<col>` per measure. A tiny
    * groupBy over the stored partials; groups whose inserts and
    * deletes net to zero disappear, exactly as a recompute would
    * drop them. */
  def read(store: TableStore, mv: String): DataFrame = {
    val d = loadDef(store, mv)
    store.read(mv)
      .groupBy(d.groupCols.map(col): _*)
      .agg(sum(CntCol).as("cnt"),
        d.sumCols.map(c => sum(sumCol(c)).as(sumCol(c))): _*)
      .where(col("cnt") > 0)
  }

  /** Fold the accumulated partial rows back to one row per group
    * (dropping net-zero groups) WITHOUT advancing or losing the
    * source binding — the watermark re-commits verbatim with the
    * folded rows (same reassert discipline as the vector-index
    * rebuild), so a refresh after compaction continues from exactly
    * where the partials left off. Run it like OPTIMIZE: when the
    * partial count grows past a few batches per group. */
  def compactPartials(store: TableStore, mv: String): Unit = {
    val d = loadDef(store, mv)
    val bound = store.lastTxn(mv, appId(d.src)).getOrElse(
      throw new IllegalStateException(s"$mv carries no mv-sync watermark"))
    val mvSnap = store.currentVersion(mv)
    val folded = store.read(mv)
      .groupBy(d.groupCols.map(col): _*)
      .agg(sum(CntCol).as(CntCol),
        d.sumCols.map(c => sum(sumCol(c)).as(sumCol(c))): _*)
      .where(col(CntCol) =!= 0L)
    store.overwriteReassertTxn(mv, folded.coalesce(4), appId(d.src), bound,
      readSnapshot = mvSnap)
  }
}
