package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate materialized views over a
  * [[TableStore]] table — the change-data-feed consumer
  * `TableStore.changes` was built for (its doc: "an incremental
  * materialized view reads the feed, not the table").
  *
  * Scope: GROUP BY views over `count(*)` / `sum(col)` — the pair
  * that folds under BOTH insert and delete (count ± 1, sum ± x);
  * `avg` derives as sum/count at read — plus `min(col)`/`max(col)`
  * under the standard IVM repair rule: inserts fold incrementally,
  * and a delete touching a group triggers a recompute of THAT
  * group's extrema from the source (O(affected groups' rows), the
  * best possible bound — a deleted extremum is not recoverable from
  * any delta). Recomputed extrema are fenced by a reset epoch on the
  * partial rows so pre-delete evidence can never resurface.
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

  private[lake] def defTable(mv: String): String = mv + "__def"
  // no ':' — the txn header encodes app:version with ':' reserved
  private def appId(src: String): String = s"mv-sync-$src"
  // a join view carries a SECOND cursor for its dimension side,
  // committed in the same atomic append as the fact cursor
  private def dimAppId(dim: String): String = s"mv-dimsync-$dim"
  private[lake] val CntCol = "__cnt"
  private[lake] def sumCol(c: String): String = "sum_" + c
  private[lake] def minCol(c: String): String = "min_" + c
  private[lake] def maxCol(c: String): String = "max_" + c
  private def avgCol(c: String): String = "avg_" + c
  private[lake] def cntCol(c: String): String = "cnt_" + c
  // group EXPRESSIONS may contain commas, so the def row joins them on
  // a non-printing separator no SQL expression contains
  private val GroupExprSep = "\u0001"
  // extremum control pair, present only when min/max cols exist: every
  // partial row is stamped with the source version it folded
  // (`__mm_epoch`) and whether it REPLACES older extremum evidence
  // (`__mm_reset`) — the fence that keeps a deleted extremum from
  // resurfacing out of pre-delete partial rows
  private val EpochCol = "__mm_epoch"
  private val ResetCol = "__mm_reset"

  private final case class Def(src: String, groupCols: Seq[String],
                               sumCols: Seq[String],
                               filterSql: Option[String],
                               minCols: Seq[String] = Nil,
                               maxCols: Seq[String] = Nil,
                               avgCols: Seq[String] = Nil,
                               dim: Option[String] = None,
                               joinCols: Seq[String] = Nil,
                               groupExprs: Seq[String] = Nil) {
    /** Derive the view's group columns on a source-shaped batch:
      * `groupExprs(i)` (a SQL expression over source columns — e.g. a
      * date_trunc for a daily rollup) materializes as column
      * `groupCols(i)`. Empty/identity exprs are a no-op. Every fold
      * path MUST project through this AFTER [[admitted]] (the WHERE
      * speaks source columns) and before [[partials]] (which groups
      * by the derived names). */
    def projectGroups(rows: DataFrame): DataFrame =
      if (groupExprs.isEmpty) rows
      else groupCols.zip(groupExprs).foldLeft(rows) {
        case (df, (a, e)) => if (e == a) df else df.withColumn(a, expr(e))
      }
    /** Apply the view's WHERE to a batch of source-shaped rows — the
      * initial fold and every feed fold MUST go through this, or a
      * filtered view would fold rows it never admitted. */
    def admitted(rows: DataFrame): DataFrame =
      filterSql.fold(rows)(f => rows.where(expr(f)))
    def hasMm: Boolean = minCols.nonEmpty || maxCols.nonEmpty
    /** Columns whose signed SUM the view stores: declared sums plus
      * the numerators of declared averages. */
    def storedSumCols: Seq[String] = (sumCols ++ avgCols).distinct
  }

  private def loadDef(store: TableStore, mv: String): Def = {
    val r = store.read(defTable(mv)).collect() match {
      case Array(row) => row
      case rows => throw new IllegalStateException(
        s"$mv is not a materialized view (definition rows: ${rows.length})")
    }
    def split(s: String) = s.split(",").toSeq.filter(_.nonEmpty)
    // dim/join_cols arrived with join views — tolerate a def row
    // written before they existed
    def opt(c: String): String =
      if (r.schema.fieldNames.contains(c)) Option(r.getAs[String](c))
        .getOrElse("")
      else ""
    Def(r.getAs[String]("src"), split(r.getAs[String]("group_cols")),
      split(r.getAs[String]("sum_cols")),
      Option(r.getAs[String]("filter_sql")).filter(_.nonEmpty),
      split(r.getAs[String]("min_cols")), split(r.getAs[String]("max_cols")),
      split(r.getAs[String]("avg_cols")),
      Some(opt("dim")).filter(_.nonEmpty), split(opt("join_cols")),
      // expressions may contain commas — they join on the
    // non-printing GroupExprSep
      opt("group_exprs").split(GroupExprSep).toSeq.filter(_.nonEmpty))
  }

  private def writeDef(store: TableStore, mv: String, d: Def): Unit = {
    val spark = store.spark
    import spark.implicits._
    store.create(defTable(mv),
      Seq((d.src, d.groupCols.mkString(","), d.sumCols.mkString(","),
        d.filterSql.getOrElse(""), d.minCols.mkString(","),
        d.maxCols.mkString(","), d.avgCols.mkString(","),
        d.dim.getOrElse(""), d.joinCols.mkString(","),
        d.groupExprs.mkString(GroupExprSep)))
        .toDF("src", "group_cols", "sum_cols", "filter_sql",
          "min_cols", "max_cols", "avg_cols", "dim", "join_cols",
          "group_exprs"))
  }

  /** Signed partial rows for one batch: per group, `__cnt` = Σ sign
    * and `sum_<c>` = Σ c·sign. NULL measure values vanish from the
    * sum on both the +1 and the -1 side (same row, same NULL), so
    * insert/delete pairs cancel exactly. Averages additionally store
    * the signed NON-NULL count `cnt_<c>` — SQL avg ignores NULL rows,
    * so dividing by `__cnt` would be wrong the moment a measure holds
    * a NULL. min/max fold only INSERT images (a delete image's
    * extremum is repaired by the refresh's affected-group recompute,
    * never subtracted) and each row stamps the `(epoch, reset)`
    * fence. */
  private def partials(rows: DataFrame, d: Def, sign: Column,
                       epoch: Long, reset: Boolean): DataFrame = {
    val aggs =
      d.storedSumCols.map(c => sum(col(c) * sign).as(sumCol(c))) ++
      // signed NON-NULL count per summed column — it disambiguates
      // "the non-null values canceled to 0" from "no non-null values
      // survive" (SQL sum/avg answer 0 vs NULL there), and it is the
      // avg denominator (SQL avg ignores NULL rows)
      d.storedSumCols.map(c => sum(when(col(c).isNotNull, sign)
        .otherwise(lit(0L))).as(cntCol(c))) ++
      d.minCols.map(c => min(when(sign > 0, col(c))).as(minCol(c))) ++
      d.maxCols.map(c => max(when(sign > 0, col(c))).as(maxCol(c))) ++
      (if (d.hasMm) Seq(first(lit(epoch)).as(EpochCol),
        first(lit(reset)).as(ResetCol)) else Nil)
    rows.groupBy(d.groupCols.map(col): _*)
      .agg(sum(sign).as(CntCol), aggs: _*)
  }

  /** Create `mv` = SELECT groupCols, count(*), sum/min/max(cols...)
    * FROM `src` [WHERE filter] GROUP BY groupCols, bound to `src`'s
    * CURRENT version, as one initial full fold + the watermark in one
    * atomic create. A `filter` (Spark SQL over source columns) stays
    * self-maintainable: the feed's insert AND delete images pass the
    * same predicate, so rows the view never admitted can't be
    * subtracted. min/max maintain incrementally on inserts; a delete
    * touching a group triggers an O(that group's source rows)
    * recompute at refresh time (see [[refresh]]) — bounded repair,
    * never a full-view rescan. `groupExprs` (optional, parallel to
    * `groupCols`) derives each group column from a SQL expression
    * over source columns — the daily/hourly-rollup shape
    * (`date_trunc(...)` AS day): every fold path projects the
    * expression before grouping, so the view maintains exactly as if
    * the source carried the derived column. Returns the bound source
    * version. */
  def create(store: TableStore, mv: String, src: String,
             groupCols: Seq[String], sumCols: Seq[String],
             filter: Option[String] = None,
             minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil,
             avgCols: Seq[String] = Nil,
             groupExprs: Seq[String] = Nil): Long = {
    require(groupCols.nonEmpty, "at least one group column")
    require(groupExprs.isEmpty || groupExprs.length == groupCols.length,
      "groupExprs must be empty or parallel to groupCols")
    val spark = store.spark
    import spark.implicits._
    val v = store.currentVersion(src).getOrElse(
      throw new IllegalStateException(s"table $src does not exist"))
    val d = Def(src, groupCols, sumCols, filter, minCols, maxCols, avgCols,
      groupExprs = groupExprs)
    writeDef(store, mv, d)
    val base = partials(
      d.projectGroups(d.admitted(store.readVersion(src, v))), d, lit(1L),
      epoch = v, reset = true)
    store.createTxn(mv, base.coalesce(4), appId(src), v)
    v
  }

  /** Create a JOIN materialized view: `mv` = SELECT groupCols,
    * count(*), sum/avg(cols...) FROM `fact` INNER JOIN `dim` USING
    * (joinCols) [WHERE filter] GROUP BY groupCols — group, measure,
    * and filter columns may come from EITHER side of the join.
    * Maintained under changes to BOTH tables by the exact bag-algebra
    * identity Δ(F⋈D) = ΔF⋈D_new ⊕ F_old⋈ΔD (each side's change feed
    * signed ±1, the sign surviving the join into the partials): a
    * fact-only day costs O(ΔF ⋈ D); a dim update costs O(F ⋈ ΔD) —
    * an inner join on the changed keys, which partition/stats pruning
    * on the fact's join column cuts to the affected slice. The two
    * cursors (fact version, dim version) ride the SAME atomic append
    * as the delta rows ([[TableStore.appendTxns]]), so refresh stays
    * exactly-once under crash redelivery with either or both sides
    * moving. min/max are not supported on join views (their delete
    * repair would re-join the affected groups; use a plain view over
    * a pre-joined table if extrema over a join are needed) — additive
    * measures only (count/sum/avg). Returns the bound fact version.
    */
  def createJoined(store: TableStore, mv: String, fact: String,
                   dim: String, joinCols: Seq[String],
                   groupCols: Seq[String], sumCols: Seq[String],
                   filter: Option[String] = None,
                   avgCols: Seq[String] = Nil,
                   groupExprs: Seq[String] = Nil): Long = {
    require(groupCols.nonEmpty, "at least one group column")
    require(joinCols.nonEmpty, "at least one join column")
    require(groupExprs.isEmpty || groupExprs.length == groupCols.length,
      "groupExprs must be empty or parallel to groupCols")
    val vF = store.currentVersion(fact).getOrElse(
      throw new IllegalStateException(s"table $fact does not exist"))
    val vD = store.currentVersion(dim).getOrElse(
      throw new IllegalStateException(s"table $dim does not exist"))
    val d = Def(fact, groupCols, sumCols, filter, Nil, Nil, avgCols,
      Some(dim), joinCols, groupExprs)
    writeDef(store, mv, d)
    val joined = store.readVersion(fact, vF)
      .join(store.readVersion(dim, vD), joinCols)
    val base = partials(d.projectGroups(d.admitted(joined)), d, lit(1L),
      epoch = vF, reset = true)
    store.createTxns(mv, base.coalesce(4),
      Seq(appId(fact) -> vF, dimAppId(dim) -> vD))
    vF
  }

  /** Fold `src`'s change feed since the last refresh into `mv` as ONE
    * atomic append of signed partial rows — O(changed data). Returns
    * the source version now bound (unchanged if already current).
    * Crash-safe: redelivery of an already-folded version no-ops via
    * the txn guard; a concurrent refresher landing first trips the
    * snapshot check and this call retries from the new watermark. */
  def refresh(store: TableStore, mv: String): Long = {
    val d = loadDef(store, mv)
    if (d.dim.isDefined) refreshJoined(store, mv, d)
    else refreshPlain(store, mv, d)
  }

  /** Join-view refresh: fold ΔF⋈D_new ⊕ F_old⋈ΔD (see
    * [[createJoined]]) into one atomic append advancing BOTH cursors.
    * Reading F_old needs the bound fact version still retained —
    * the same keep-up-before-vacuum discipline every CDF consumer
    * here lives by (MaintenanceJob refreshes views before vacuum).
    * The dim delta is broadcast (a dim change batch is small by
    * construction); the fact delta joins the CURRENT dim snapshot,
    * where the usual star-schema broadcast applies. Returns the bound
    * fact version. */
  private def refreshJoined(store: TableStore, mv: String, d: Def): Long = {
    val dim = d.dim.get
    var attempts = 0
    while (true) {
      attempts += 1
      val boundF = store.lastTxn(mv, appId(d.src)).getOrElse(
        throw new IllegalStateException(
          s"$mv carries no mv-sync watermark for ${d.src}"))
      val boundD = store.lastTxn(mv, dimAppId(dim)).getOrElse(
        throw new IllegalStateException(
          s"$mv carries no mv-dimsync watermark for $dim"))
      val curF = store.currentVersion(d.src).getOrElse(
        throw new IllegalStateException(s"table ${d.src} does not exist"))
      val curD = store.currentVersion(dim).getOrElse(
        throw new IllegalStateException(s"table $dim does not exist"))
      if (curF <= boundF && curD <= boundD) return boundF
      val mvSnap = store.currentVersion(mv)
      val sign = when(col("_change_type") === "insert", lit(1L))
        .otherwise(lit(-1L))
      var deltas = List.empty[DataFrame]
      if (curF > boundF) {
        val dF = store.changes(d.src, boundF, curF).drop("_commit_version")
        deltas ::= partials(
          d.projectGroups(d.admitted(
            dF.join(store.readVersion(dim, curD), d.joinCols))),
          d, sign, epoch = curF, reset = false)
      }
      if (curD > boundD) {
        val dD = store.changes(dim, boundD, curD).drop("_commit_version")
        deltas ::= partials(
          d.projectGroups(d.admitted(store.readVersion(d.src, boundF)
            .join(broadcast(dD), d.joinCols))),
          d, sign, epoch = curF, reset = false)
      }
      val delta = deltas.reduce(_ unionByName _)
      try {
        store.appendTxns(mv, delta.coalesce(4),
          Seq(appId(d.src) -> curF, dimAppId(dim) -> curD),
          readSnapshot = mvSnap)
        return curF
      } catch {
        case _: SnapshotConflictException if attempts < 5 => // retry
      }
    }
    sys.error("unreachable")
  }

  private def refreshPlain(store: TableStore, mv: String, d: Def): Long = {
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
      val feed = d.projectGroups(d.admitted(store.changes(d.src, bound, cur)
        .drop("_commit_version")))
      val folded = partials(feed, d, sign, epoch = cur, reset = false)
      // min/max extremum repair: a delete may have removed a group's
      // recorded extremum, which no delta can restore — recompute
      // min/max for EXACTLY the delete-touched groups from the
      // source's folded version (semi-join: O(those groups' rows),
      // partition/stats pruning applies) and stamp their delta rows
      // reset=true, fencing off every older partial's extremum
      // evidence. Insert-only refreshes never touch the source.
      val delta =
        if (!d.hasMm) folded
        else {
          val affected = feed.where(col("_change_type") === "delete")
            .select(d.groupCols.map(col): _*).distinct()
          if (affected.isEmpty) folded
          else {
            val reAggs = d.minCols.map(c => min(col(c)).as("__re_min_" + c)) ++
              d.maxCols.map(c => max(col(c)).as("__re_max_" + c))
            val re = d.projectGroups(d.admitted(store.readVersion(d.src, cur)))
              .join(affected, d.groupCols, "left_semi")
              .groupBy(d.groupCols.map(col): _*)
              .agg(reAggs.head, reAggs.tail: _*)
            // groups the deletes EMPTIED have no source rows left: keep
            // them via the affected side so their fence still lands
            // (extrema NULL; the group nets to cnt 0 and drops at read)
            val reAll = affected.withColumn("__is_aff", lit(true))
              .join(re, d.groupCols, "left_outer")
            // project back to the EXACT partial-row schema: every
            // additive column (stored sums AND avg non-null counts)
            // must survive, or the dropped column null-fills on the
            // merged read and the aggregate silently loses the batch
            folded.join(reAll, d.groupCols, "left_outer")
              .select(d.groupCols.map(col) ++ Seq(col(CntCol)) ++
                d.storedSumCols.map(c => col(sumCol(c))) ++
                d.storedSumCols.map(c => col(cntCol(c))) ++
                d.minCols.map(c => when(col("__is_aff").isNotNull,
                  col("__re_min_" + c)).otherwise(col(minCol(c)))
                  .as(minCol(c))) ++
                d.maxCols.map(c => when(col("__is_aff").isNotNull,
                  col("__re_max_" + c)).otherwise(col(maxCol(c)))
                  .as(maxCol(c))) ++
                Seq(col(EpochCol),
                  col("__is_aff").isNotNull.as(ResetCol)): _*)
          }
        }
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

  /** Per-group consolidation of the stored partials, preserving the
    * internal column names. min/max respect the reset fence: per
    * group, only rows at or above the group's latest reset epoch
    * contribute extrema — older rows may still carry a deleted
    * extremum. Two O(view) passes (the fence, then the fold); the
    * view is the small side by construction. */
  private def consolidate(d: Def, rows: DataFrame): DataFrame = {
    val additive =
      d.storedSumCols.map(c => sum(sumCol(c)).as(sumCol(c))) ++
      d.storedSumCols.map(c => sum(cntCol(c)).as(cntCol(c)))
    if (!d.hasMm)
      rows.groupBy(d.groupCols.map(col): _*)
        .agg(sum(CntCol).as(CntCol), additive: _*)
    else {
      val fence = rows.groupBy(d.groupCols.map(col): _*)
        .agg(max(when(col(ResetCol), col(EpochCol))).as("__w"))
      val fenced = rows.join(fence, d.groupCols)
      val admit = col(EpochCol) >= coalesce(col("__w"), lit(Long.MinValue))
      fenced.groupBy(d.groupCols.map(col): _*)
        .agg(sum(CntCol).as(CntCol),
          (additive ++
            d.minCols.map(c => min(when(admit, col(minCol(c))))
              .as(minCol(c))) ++
            d.maxCols.map(c => max(when(admit, col(maxCol(c))))
              .as(maxCol(c)))): _*)
    }
  }

  /** The view's consolidated rows: one row per surviving group —
    * group cols, `cnt` (count(*)), `sum_<col>`/`min_<col>`/
    * `max_<col>`/`avg_<col>` per declared measure (`avg` divides the
    * stored signed sum by the stored signed NON-NULL count, as
    * DOUBLE — NULL when the group holds no non-null values, matching
    * SQL avg). A tiny groupBy over the stored partials; groups whose
    * inserts and deletes net to zero disappear, exactly as a
    * recompute would drop them. */
  def read(store: TableStore, mv: String): DataFrame = {
    val d = loadDef(store, mv)
    val cons = consolidate(d, store.read(mv))
    val out = d.groupCols.map(col) ++ Seq(col(CntCol).as("cnt")) ++
      d.sumCols.map(c => when(col(cntCol(c)) > 0, col(sumCol(c)))
        .as(sumCol(c))) ++
      d.avgCols.map(c => when(col(cntCol(c)) > 0,
        col(sumCol(c)).cast("double") / col(cntCol(c))).as(avgCol(c))) ++
      d.minCols.map(c => col(minCol(c))) ++
      d.maxCols.map(c => col(maxCol(c)))
    cons.select(out: _*).where(col("cnt") > 0)
  }

  /** One row of view metadata — definition, binding, and staleness —
    * all from manifests and the 1-row def table, no data scan:
    * (view_name, source, group_cols, sum_cols, min_cols, max_cols,
    * filter_sql, bound_version, source_version, versions_behind,
    * n_partial_rows). `versions_behind` is the REFRESH debt gauge a
    * scheduler polls; `n_partial_rows` (from the stats sidecar's
    * footer counts, physical rows incl. MoR debt) is the OPTIMIZE
    * gauge. */
  def describe(store: TableStore, mv: String): DataFrame = {
    val d = loadDef(store, mv)
    val spark = store.spark
    import spark.implicits._
    val bound = store.lastTxn(mv, appId(d.src))
    val srcV = store.currentVersion(d.src)
    val behind = for (b <- bound; s <- srcV) yield math.max(0L, s - b)
    val partialRows = store.fileRowCounts(mv).values.sum
    // join views report the dim cursor too; plain views show NULLs
    val dimBound = d.dim.flatMap(dim => store.lastTxn(mv, dimAppId(dim)))
    val dimV = d.dim.flatMap(store.currentVersion)
    val dimBehind = for (b <- dimBound; s <- dimV) yield math.max(0L, s - b)
    Seq((mv, d.src, d.groupCols.mkString(","), d.sumCols.mkString(","),
      d.avgCols.mkString(","), d.minCols.mkString(","),
      d.maxCols.mkString(","), d.filterSql.getOrElse(""),
      bound, srcV, behind, partialRows,
      d.dim.getOrElse(""), d.joinCols.mkString(","), dimBound, dimBehind))
      .toDF("view_name", "source", "group_cols", "sum_cols", "avg_cols",
        "min_cols", "max_cols", "filter_sql", "bound_version",
        "source_version", "versions_behind", "n_partial_rows",
        "dim", "join_cols", "dim_bound_version", "dim_versions_behind")
  }

  /** The view's rewrite-facing surface: definition + freshness in one
    * metadata-only probe (1-row def table + two manifest headers).
    * `fresh` means every committed source version is folded — the
    * precondition for [[MvRewrite]] to serve a query from the view
    * instead of the source (a stale view would answer from the past).
    */
  private[lake] final case class Surface(mv: String, src: String,
      groupCols: Seq[String], storedSumCols: Seq[String],
      minCols: Seq[String], maxCols: Seq[String],
      filterSql: Option[String], fresh: Boolean,
      dim: Option[String] = None, joinCols: Seq[String] = Nil,
      groupExprs: Seq[String] = Nil) {
    def joined: Boolean = dim.isDefined
  }

  private[lake] def surface(store: TableStore, mv: String): Surface = {
    val d = loadDef(store, mv)
    def current(app: String, table: String): Boolean = (for {
      b <- store.lastTxn(mv, app)
      c <- store.currentVersion(table)
    } yield c <= b).getOrElse(false)
    val fresh = current(appId(d.src), d.src) &&
      d.dim.forall(dim => current(dimAppId(dim), dim))
    // a join view's rows have JOIN multiplicity — it serves only
    // queries over the SAME join, never a single-table aggregate
    Surface(mv, d.src, d.groupCols, d.storedSumCols, d.minCols, d.maxCols,
      d.filterSql, fresh, dim = d.dim, joinCols = d.joinCols,
      groupExprs = d.groupExprs)
  }

  /** One consolidated row per SURVIVING group with the INTERNAL
    * additive column names (`__cnt`, `sum_<c>`, `cnt_<c>`, `min_<c>`,
    * `max_<c>`) — the substrate [[MvRewrite]] re-aggregates when a
    * query groups by a SUBSET of the view's keys. Everything here is
    * additive (or re-foldable, for extrema), so a further groupBy
    * over these rows is exact. O(view) work. */
  private[lake] def consolidatedAdditive(store: TableStore,
                                         mv: String): DataFrame = {
    val d = loadDef(store, mv)
    consolidate(d, store.read(mv)).where(col(CntCol) > 0)
  }

  /** Fold the accumulated partial rows back to one row per group
    * (dropping net-zero groups) WITHOUT advancing or losing the
    * source binding — the watermark re-commits verbatim with the
    * folded rows (same reassert discipline as the vector-index
    * rebuild), so a refresh after compaction continues from exactly
    * where the partials left off. The folded rows re-stamp
    * reset=true at the bound epoch: they ARE the fence-admitted
    * consolidation, so they replace all prior extremum evidence by
    * construction. Run it like OPTIMIZE: when the partial count grows
    * past a few batches per group. */
  def compactPartials(store: TableStore, mv: String): Unit = {
    val d = loadDef(store, mv)
    val bound = store.lastTxn(mv, appId(d.src)).getOrElse(
      throw new IllegalStateException(s"$mv carries no mv-sync watermark"))
    // a join view's dim cursor must survive the fold too, or the next
    // refresh would think the dim binding was vacuumed
    val txns = Seq(appId(d.src) -> bound) ++ d.dim.map { dim =>
      dimAppId(dim) -> store.lastTxn(mv, dimAppId(dim)).getOrElse(
        throw new IllegalStateException(
          s"$mv carries no mv-dimsync watermark for $dim"))
    }
    val mvSnap = store.currentVersion(mv)
    val folded0 = consolidate(d, store.read(mv))
      .where(col(CntCol) =!= 0L)
    val folded =
      if (!d.hasMm) folded0
      else folded0.withColumn(EpochCol, lit(bound))
        .withColumn(ResetCol, lit(true))
    store.overwriteReassertTxns(mv, folded.coalesce(4), txns,
      readSnapshot = mvSnap)
  }
}
