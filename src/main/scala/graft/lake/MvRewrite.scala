package graft.lake

import java.util.concurrent.atomic.AtomicLong

import scala.util.control.NonFatal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedFunction, UnresolvedHaving, UnresolvedOrdinal, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Ascending, Expression, Literal, NullsFirst, SortOrder, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, Limit, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.plans.{Inner, UsingJoin}
import org.apache.spark.sql.types.IntegerType

/** Answer aggregate queries from a materialized view instead of the
  * source table — the rewrite half of the classic MV contract
  * (Goldstein & Larson, "Optimizing queries using materialized
  * views", SIGMOD'01), scoped to the views [[MaterializedView]] can
  * maintain. The reference delegates this to its warehouse; here the
  * SQL front door ([[GraftSql]]) consults the store's own view
  * registry before handing a SELECT to Spark.
  *
  * A query rewrites when a bound view exists with:
  *  - the same source SHAPE: a plain view for `FROM t`, a join view
  *    for `FROM a JOIN b USING (cols)` over the same two tables
  *    (order-free) and using-columns — and the view FRESH (every
  *    committed version of every bound table folded — a stale view
  *    would answer from the past; run REFRESH MATERIALIZED VIEW
  *    first or let the maintenance job keep it current);
  *  - the query's GROUP BY a SUBSET of the view's group columns —
  *    the stored partial aggregates are additive (count/sum as
  *    signed sums, avg as sum + non-null count, min/max re-foldable),
  *    so a coarser grouping re-aggregates exactly from one
  *    consolidated row per view group: O(view) work, never O(source);
  *  - every aggregate translatable: count(*)/count(c)/sum(c)/avg(c)
  *    over the view's summed columns, min(c)/max(c) over its extrema
  *    columns — no DISTINCT, no FILTER clauses;
  *  - the view's WHERE (if any) appearing verbatim among the query's
  *    conjuncts, and every RESIDUAL conjunct referencing only view
  *    GROUP columns (group columns are constant within a view row,
  *    so a residual over them filters view rows exactly as it would
  *    filter source rows).
  *
  * Safety net: the rewritten frame must agree with the direct plan's
  * ANALYZED schema (names and types) or the rewrite abstains — so a
  * type-promotion mismatch (e.g. decimal widening differing between
  * the stored partial and a direct aggregate) can never serve wrong
  * types, and any internal error falls back to direct execution.
  *
  * At 100 TB this is the read-path payoff of the whole IVM stack: a
  * dashboard aggregate over a daily-append corpus costs O(view)
  * instead of a full scan, with freshness guaranteed by the
  * mv-sync watermark rather than hoped for.
  */
object MvRewrite {

  /** Rewrites served since JVM start — specs assert the serve path. */
  val hits = new AtomicLong
  /** Last view that served a rewrite (diagnostics / specs). */
  @volatile var lastServed: Option[String] = None

  private[lake] val EnabledKey = "graft.mv.rewrite.enabled"

  private def enabled(spark: SparkSession): Boolean =
    spark.conf.getOption(EnabledKey).forall(_.toBoolean)

  // ---- query-shape model -------------------------------------------------

  private sealed trait Out
  /** Group-column reference in the select list. `typed` is the name
    * as the user wrote it — the analyzer preserves that casing in the
    * direct plan's output, so the rewrite must too. */
  private final case class GRef(lc: String, typed: String,
                                alias: Option[String]) extends Out
  /** Translatable aggregate; `fn` ∈ count_star|count|sum|avg|min|max. */
  private final case class Meas(fn: String, arg: Option[String],
                                out: String) extends Out

  /** `join` is set for `FROM a JOIN b USING (cols)` shapes: the two
    * table names (order-free) plus the lowercase using-column set.
    * `groupLc` may be EMPTY — a global aggregate (one output row).
    * `having`/`sort` are pre-translated: aggregate-function references
    * became attribute refs to output aliases or to `hidden` measures
    * (computed for the filter/ordering, dropped from the output).
    * `limit` is a LIMIT n to apply after the ordering. */
  private final case class Shape(src: String, where: Option[Expression],
                                 groupLc: Seq[String], outs: Seq[Out],
                                 join: Option[(String, Set[String])] = None,
                                 having: Option[Expression] = None,
                                 hidden: Seq[Meas] = Nil,
                                 sort: Seq[(Expression, Boolean, Boolean)] = Nil,
                                 limit: Option[Int] = None)

  /** Rewrites aggregate-function references (in HAVING / ORDER BY)
    * into post-aggregation column refs, reusing an output alias when
    * the same measure is already selected and allocating a hidden
    * `__hv_<i>` measure otherwise. */
  private final class AggRefs(outs: Seq[Out]) {
    val hidden = scala.collection.mutable.ArrayBuffer.empty[Meas]
    private def nameFor(fn: String, arg: Option[String]): String =
      outs.collectFirst { case Meas(`fn`, `arg`, out) => out }
        .orElse(hidden.collectFirst { case Meas(`fn`, `arg`, out) => out })
        .getOrElse {
          val n = s"__hv_${hidden.size}"; hidden += Meas(fn, arg, n); n
        }
    def translate(e: Expression): Option[Expression] = {
      var ok = true
      val t = e.transform {
        case f: UnresolvedFunction =>
          parseMeasure(f) match {
            case Some((fn, arg)) => UnresolvedAttribute(Seq(nameFor(fn, arg)))
            case None => ok = false; f
          }
      }
      if (ok && !t.exists { case _: SubqueryExpression => true
          case _ => false }) Some(t)
      else None
    }
  }

  /** Lowercase every attribute / function name so two independently
    * parsed trees of the same predicate compare equal regardless of
    * the casing the user typed. */
  private def norm(e: Expression): Expression = e.transform {
    case UnresolvedAttribute(parts) =>
      UnresolvedAttribute(parts.map(_.toLowerCase))
    case f: UnresolvedFunction =>
      f.copy(nameParts = f.nameParts.map(_.toLowerCase))
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  private def parseMeasure(e: Expression): Option[(String, Option[String])] =
    e match {
      case f: UnresolvedFunction if !f.isDistinct && f.filter.isEmpty =>
        val fn = f.nameParts.map(_.toLowerCase).mkString(".")
        (fn, f.arguments) match {
          case ("count", Seq(_: UnresolvedStar)) => Some(("count_star", None))
          case ("count", Seq(Literal(_, IntegerType))) =>
            Some(("count_star", None))
          case ("count" | "sum" | "avg" | "min" | "max",
                Seq(UnresolvedAttribute(Seq(n)))) =>
            Some((fn, Some(n.toLowerCase)))
          case _ => None
        }
      case _ => None
    }

  /** Structural match: Aggregate over [Filter over] a bare one-part
    * relation, group keys plain columns (ordinals substituted), every
    * output either a group column or an ALIASED translatable
    * aggregate. Anything else → None, and the statement runs direct.
    */
  /** A bare one-part relation, or `a JOIN b USING (cols)` of two —
    * returns (primary table, optional (other table, using cols)). */
  private def sourceOf(p: LogicalPlan): Option[(String, Option[(String, Set[String])])] =
    p match {
      case r: UnresolvedRelation if r.multipartIdentifier.length == 1 =>
        Some((r.multipartIdentifier.head.toLowerCase, None))
      case j: Join if j.condition.isEmpty =>
        (j.joinType, j.left, j.right) match {
          case (UsingJoin(Inner, cols), l: UnresolvedRelation,
                r: UnresolvedRelation)
              if l.multipartIdentifier.length == 1 &&
                r.multipartIdentifier.length == 1 =>
            Some((l.multipartIdentifier.head.toLowerCase,
              Some((r.multipartIdentifier.head.toLowerCase,
                cols.map(_.toLowerCase).toSet))))
          case _ => None
        }
      case _ => None
    }

  /** Peel LIMIT / ORDER BY / HAVING off the top; the core must be an
    * Aggregate. Returns (aggregate, having cond, sort order, limit). */
  private def unwrapAgg(plan: LogicalPlan): Option[(Aggregate,
      Option[Expression], Seq[SortOrder], Option[Int])] = {
    val (limited, limit) = plan match {
      case Limit(l @ Literal(_, IntegerType), child) =>
        (child, Some(l.value.asInstanceOf[Int]))
      case p => (p, None)
    }
    val (sorted, order) = limited match {
      case Sort(ord, true, child, _) => (child, ord)
      case p => (p, Nil)
    }
    sorted match {
      case UnresolvedHaving(cond, a: Aggregate) => Some((a, Some(cond), order, limit))
      case a: Aggregate => Some((a, None, order, limit))
      // a GLOBAL aggregate (no GROUP BY) parses as a Project — the
      // analyzer's GlobalAggregates conversion hasn't run yet. Treat
      // it as an empty-grouping Aggregate iff at least one projection
      // is an aggregate call (a plain SELECT must never match).
      case p: Project if p.projectList.exists {
          case Alias(f: UnresolvedFunction, _) => parseMeasure(f).isDefined
          case _ => false
        } =>
        Some((Aggregate(Nil, p.projectList, p.child), None, order, limit))
      case _ => None
    }
  }

  private def shapeOf(plan: LogicalPlan): Option[Shape] =
    unwrapAgg(plan).flatMap { case (a, havingRaw, orderRaw, limit) =>
      val srcAndWhere = a.child match {
        case Filter(cond, s) => sourceOf(s).map((_, Some(cond)))
        case s => sourceOf(s).map((_, None))
      }
      srcAndWhere.flatMap { case ((srcName, join), where) =>
        {
          val aggExprs = a.aggregateExpressions
          // GROUP BY <ordinal> — resolve against the select list like
          // the analyzer would (the parser emits UnresolvedOrdinal;
          // accept a plain integer literal too for robustness)
          def ordinal(e: Expression): Option[Int] = e match {
            case UnresolvedOrdinal(i) => Some(i)
            case l @ Literal(_, IntegerType) => Some(l.value.asInstanceOf[Int])
            case _ => None
          }
          val groupExprs = a.groupingExpressions.map { e =>
            ordinal(e).filter(i => i >= 1 && i <= aggExprs.length)
              .map(i => aggExprs(i - 1) match {
                case Alias(c, _) => c
                case UnresolvedAlias(c, _) => c
                case x => x
              }).getOrElse(e)
          }
          val groupLc = groupExprs.map {
            case UnresolvedAttribute(Seq(n)) => Some(n.toLowerCase)
            case _ => None
          }
          val outs = aggExprs.map {
            case UnresolvedAttribute(Seq(n)) =>
              Some(GRef(n.toLowerCase, n, None))
            case Alias(UnresolvedAttribute(Seq(n)), name) =>
              Some(GRef(n.toLowerCase, n, Some(name)))
            case Alias(child, name) =>
              parseMeasure(child).map { case (fn, arg) => Meas(fn, arg, name) }
            case _ => None
          }
          // empty grouping = global aggregate (one row) — allowed as
          // long as there is at least one measure to translate
          if (groupLc.exists(_.isEmpty) || outs.exists(_.isEmpty)) None
          else {
            val g = groupLc.flatten
            val o = outs.flatten
            if (o.isEmpty) None
            else {
              // every selected group ref must actually be grouped on
              val refsOk = o.forall {
                case GRef(lc, _, _) => g.contains(lc)
                case _: Meas => true
              }
              // HAVING / ORDER BY: aggregate refs become column refs
              // (hidden measures allocated as needed); remaining
              // attributes must be group columns or output aliases
              val refs = new AggRefs(o)
              val having = havingRaw.map(refs.translate)
              val sort = orderRaw.map(so => refs.translate(so.child)
                .map((_, so.direction == Ascending,
                  so.nullOrdering == NullsFirst)))
              val visible = g.toSet ++
                o.collect { case Meas(_, _, out) => out.toLowerCase } ++
                o.collect { case GRef(_, t, al) =>
                  al.getOrElse(t).toLowerCase } ++
                refs.hidden.map(_.out.toLowerCase)
              def attrsOk(e: Expression): Boolean =
                e.collect { case UnresolvedAttribute(p) => p }.forall(p =>
                  p.length == 1 && visible.contains(p.head.toLowerCase))
              val translatedOk =
                having.forall(_.exists(attrsOk)) &&
                  sort.forall(_.exists { case (e, _, _) => attrsOk(e) })
              if (refsOk && translatedOk)
                Some(Shape(srcName, where, g, o, join,
                  having.flatten, refs.hidden.toSeq,
                  sort.flatten, limit))
              else None
            }
          }
        }
      }
    }

  // ---- candidate matching ------------------------------------------------

  private def satisfies(s: MaterializedView.Surface, m: Meas): Boolean = {
    def in(cols: Seq[String], c: String) =
      cols.exists(_.equalsIgnoreCase(c))
    m match {
      case Meas("count_star", _, _) => true
      case Meas("count" | "sum" | "avg", Some(c), _) =>
        in(s.storedSumCols, c)
      case Meas("min", Some(c), _) => in(s.minCols, c)
      case Meas("max", Some(c), _) => in(s.maxCols, c)
      case _ => false
    }
  }

  /** View-filter subsumption: the view's conjuncts must appear
    * verbatim (normalized) among the query's; what remains must
    * touch only view group columns and contain no subquery or
    * function call. Returns the residual conjuncts, or None when the
    * view cannot serve this WHERE. */
  private def residualOf(spark: SparkSession, s: MaterializedView.Surface,
                         where: Option[Expression]): Option[Seq[Expression]] = {
    val qConj = where.map(w => conjuncts(norm(w))).getOrElse(Nil)
    val vConj = s.filterSql
      .map(f => conjuncts(norm(
        spark.sessionState.sqlParser.parseExpression(f))))
      .getOrElse(Nil)
    if (!vConj.forall(qConj.contains)) return None
    val residual = qConj.filterNot(vConj.contains)
    val groupLc = s.groupCols.map(_.toLowerCase).toSet
    val ok = residual.forall { e =>
      val attrs = e.collect { case UnresolvedAttribute(parts) => parts }
      attrs.forall(p => p.length == 1 && groupLc.contains(p.head)) &&
        !e.exists {
          case _: SubqueryExpression | _: UnresolvedFunction => true
          case _ => false
        }
    }
    if (ok) Some(residual) else None
  }

  // ---- the rewrite -------------------------------------------------------

  private def build(store: TableStore, s: MaterializedView.Surface,
                    shape: Shape, residual: Seq[Expression]): DataFrame = {
    import MaterializedView.{cntCol, maxCol, minCol, sumCol, CntCol}
    def actual(cols: Seq[String], lc: String): String =
      cols.find(_.equalsIgnoreCase(lc)).get
    val base = residual.foldLeft(
      MaterializedView.consolidatedAdditive(store, s.mv))(
      (d, e) => d.where(expr(e.sql)))
    val groupCols = shape.groupLc.map(lc => col(actual(s.groupCols, lc)))
    def stored(lc: String): String = actual(s.storedSumCols, lc)
    val measures = shape.outs.collect { case m: Meas => m }
    def aggOf(m: Meas): Column = m match {
      // counts coalesce to 0: a GLOBAL aggregate over an empty view
      // still returns its one row, and SQL count never yields NULL
      case Meas("count_star", _, out) =>
        coalesce(sum(col(CntCol)), lit(0L)).as(out)
      case Meas("count", Some(c), out) =>
        coalesce(sum(col(cntCol(stored(c)))), lit(0L)).as(out)
      case Meas("sum", Some(c), out) =>
        // NULL when no non-null source values survive, like SQL sum
        when(sum(col(cntCol(stored(c)))) > 0, sum(col(sumCol(stored(c)))))
          .as(out)
      case Meas("avg", Some(c), out) =>
        when(sum(col(cntCol(stored(c)))) > 0,
          sum(col(sumCol(stored(c)))).cast("double") /
            sum(col(cntCol(stored(c))))).as(out)
      case Meas("min", Some(c), out) =>
        min(col(minCol(actual(s.minCols, c)))).as(out)
      case Meas("max", Some(c), out) =>
        max(col(maxCol(actual(s.maxCols, c)))).as(out)
      case m => sys.error(s"untranslatable measure $m") // guarded earlier
    }
    val allMeasures = measures ++ shape.hidden
    val agged =
      if (allMeasures.isEmpty) base.select(groupCols: _*).distinct()
      else {
        // empty groupCols = global aggregate: groupBy() returns its
        // one row even over an empty view, exactly like SQL
        val aggCols = allMeasures.map(aggOf)
        base.groupBy(groupCols: _*).agg(aggCols.head, aggCols.tail: _*)
      }
    val havinged = shape.having.foldLeft(agged)((d, h) => d.where(expr(h.sql)))
    val sorted =
      if (shape.sort.isEmpty) havinged
      else havinged.orderBy(shape.sort.map { case (e, asc, nullsFirst) =>
        val c = expr(e.sql)
        (asc, nullsFirst) match {
          case (true, true) => c.asc_nulls_first
          case (true, false) => c.asc_nulls_last
          case (false, true) => c.desc_nulls_first
          case (false, false) => c.desc_nulls_last
        }
      }: _*)
    val limited = shape.limit.foldLeft(sorted)((d, n) => d.limit(n))
    limited.select(shape.outs.map {
      case GRef(lc, typed, alias) =>
        col(actual(s.groupCols, lc)).as(alias.getOrElse(typed))
      case m: Meas => col(m.out)
    }: _*)
  }

  /** Attempt to serve `plan` (the parsed form of `sql`) from a fresh
    * bound materialized view. None → caller runs the statement
    * directly; never throws. Disabled inside an open store
    * transaction (staged commits are invisible to the view binding)
    * or via `graft.mv.rewrite.enabled=false`. */
  def tryRewrite(spark: SparkSession, store: TableStore, sql: String,
                 plan: LogicalPlan): Option[DataFrame] =
    try {
      if (!enabled(spark) || store.inTransaction) return None
      val shape = shapeOf(plan) match {
        case Some(sh) => sh
        case None => return None
      }
      // registry probe only after the cheap structural match passed
      val candidates = store.tables().filter(_.endsWith("__def"))
        .map(_.dropRight("__def".length))
        .filter(mv => mv.nonEmpty && store.exists(mv))
        .flatMap { mv =>
          // a table that merely LOOKS like a view (has a __def
          // companion of another shape) just drops out of the pool
          try Some(MaterializedView.surface(store, mv))
          catch { case NonFatal(_) => None }
        }
        .filter { s =>
          // the view's source shape must BE the query's: a plain view
          // for a single-table aggregate, a join view only for the
          // SAME inner join (tables order-free, using-cols as a set —
          // join multiplicity makes any other pairing wrong)
          val sourceOk = shape.join match {
            case None => !s.joined && s.src.equalsIgnoreCase(shape.src)
            case Some((other, cols)) => s.joined &&
              Set(s.src.toLowerCase, s.dim.get.toLowerCase) ==
                Set(shape.src, other) &&
              s.joinCols.map(_.toLowerCase).toSet == cols
          }
          sourceOk && s.fresh &&
            shape.groupLc.forall(g =>
              s.groupCols.exists(_.equalsIgnoreCase(g))) &&
            (shape.outs.collect { case m: Meas => m } ++ shape.hidden)
              .forall(satisfies(s, _))
        }
        .sortBy(_.groupCols.length) // cheapest first: fewest view groups
      candidates.iterator.flatMap { s =>
        residualOf(spark, s, shape.where).flatMap { residual =>
          val cand = build(store, s, shape, residual)
          // abstain unless the rewrite reproduces the direct plan's
          // analyzed schema exactly (names + types)
          val direct = spark.sql(sql)
          if (direct.schema.map(f => (f.name, f.dataType)) ==
              cand.schema.map(f => (f.name, f.dataType))) {
            hits.incrementAndGet()
            lastServed = Some(s.mv)
            Some(cand)
          } else None
        }
      }.nextOption()
    } catch { case NonFatal(_) => None }
}
