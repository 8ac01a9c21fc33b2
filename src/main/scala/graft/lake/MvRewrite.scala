package graft.lake

import java.util.concurrent.atomic.AtomicLong

import scala.util.control.NonFatal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedFunction, UnresolvedHaving, UnresolvedOrdinal, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Ascending, Expression, Literal, NullsFirst, SortOrder, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, Limit, LogicalPlan, Project, Sort, SubqueryAlias}
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
  *  - the same source SHAPE: a plain view for `FROM t`, a join/star
  *    view for a chain of inner joins over the same tables
  *    (order-free) and join-column sets — both the `USING (cols)`
  *    and the USING-equivalent `ON a.k = b.k [AND ...]` spellings
  *    (table aliases fine; qualified columns strip to bare names) —
  *    and the view FRESH (every committed version of every bound
  *    table folded — a stale view would answer from the past; run
  *    REFRESH MATERIALIZED VIEW first or let the maintenance job
  *    keep it current);
  *  - the query's GROUP BY a SUBSET of the view's group columns —
  *    the stored partial aggregates are additive (count/sum as
  *    signed sums, avg as sum + non-null count, min/max re-foldable),
  *    so a coarser grouping re-aggregates exactly from one
  *    consolidated row per view group: O(view) work, never O(source);
  *  - every aggregate translatable: count(*)/count(c)/sum(c)/avg(c)
  *    over the view's summed columns, min(c)/max(c) over its extrema
  *    columns, count(DISTINCT k) over its IDENTITY group columns
  *    (the consolidated rows enumerate surviving group combinations,
  *    so the distinct count is exact at O(view)) — no other DISTINCT,
  *    no FILTER clauses;
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
  /** Group-key reference in the select list: `e` is the NORMALIZED
    * group expression (a bare column or a derived expression like a
    * date_trunc). `typed` is the name as the user wrote it for the
    * bare-column case — the analyzer preserves that casing in the
    * direct plan's output, so the rewrite must too; expression keys
    * must be aliased. */
  private final case class GRef(e: Expression, typed: Option[String],
                                alias: Option[String]) extends Out
  /** Translatable aggregate; `fn` ∈ count_star|count|sum|avg|min|max. */
  private final case class Meas(fn: String, arg: Option[String],
                                out: String) extends Out

  /** `joins` is non-empty for `FROM a JOIN b ...` shapes: one
    * (table, lowercase join-column set) pair per joined dim, in query
    * order — both the `USING (cols)` and the USING-equivalent
    * `ON a.k = b.k [AND ...]` spellings produce the same pair.
    * `groupEs` holds the NORMALIZED group-key expressions (bare
    * columns or derived expressions; may be EMPTY — a global
    * aggregate, one output row). `having`/`sort` are pre-translated:
    * aggregate-function references became attribute refs to output
    * aliases or to `hidden` measures (computed for the
    * filter/ordering, dropped from the output). `limit` is a LIMIT n
    * to apply after the ordering. */
  private final case class Shape(src: String, where: Option[Expression],
                                 groupEs: Seq[Expression], outs: Seq[Out],
                                 joins: Seq[(String, Set[String])] = Nil,
                                 having: Option[Expression] = None,
                                 hidden: Seq[Meas] = Nil,
                                 sort: Seq[(Expression, Boolean, Boolean)] = Nil,
                                 limit: Option[Int] = None) {
    /** The query-visible name of group key i, if any: the alias the
      * select list gave it, or the bare column name. HAVING/ORDER BY
      * may reference keys only through these. */
    def keyName(i: Int): Option[String] = {
      val e = groupEs(i)
      outs.collectFirst { case GRef(`e`, _, Some(a)) => a }
        .orElse(outs.collectFirst { case GRef(`e`, Some(t), None) => t })
        .orElse(e match {
          case UnresolvedAttribute(Seq(n)) => Some(n)
          case _ => None
        })
    }
  }

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
          // servable from a KMV-sketch measure — OPT-IN only (the
          // view's deterministic KMV estimate replaces Spark's HLL
          // estimate; both are approximate, but the numbers differ)
          case ("approx_count_distinct", Seq(UnresolvedAttribute(Seq(n)))) =>
            Some(("approx_distinct", Some(n.toLowerCase)))
          case _ => None
        }
      // count(DISTINCT k): servable EXACTLY when k is an identity
      // group column — the consolidated view rows enumerate the
      // surviving group combinations, so distinct k per coarser group
      // is a count over view rows (checked in satisfies)
      case f: UnresolvedFunction if f.isDistinct && f.filter.isEmpty =>
        (f.nameParts.map(_.toLowerCase).mkString("."), f.arguments) match {
          case ("count", Seq(UnresolvedAttribute(Seq(n)))) =>
            Some(("count_distinct", Some(n.toLowerCase)))
          case _ => None
        }
      case _ => None
    }

  /** Structural match: Aggregate over [Filter over] a bare one-part
    * relation, group keys plain columns (ordinals substituted), every
    * output either a group column or an ALIASED translatable
    * aggregate. Anything else → None, and the statement runs direct.
    */
  /** A (possibly aliased) bare one-part relation — returns
    * (table name, strippable qualifiers: the table name and its
    * alias, lowercase). */
  private def relationOf(p: LogicalPlan): Option[(String, Set[String])] =
    p match {
      case r: UnresolvedRelation if r.multipartIdentifier.length == 1 =>
        val t = r.multipartIdentifier.head.toLowerCase
        Some((t, Set(t)))
      case SubqueryAlias(id, r: UnresolvedRelation)
          if r.multipartIdentifier.length == 1 =>
        val t = r.multipartIdentifier.head.toLowerCase
        Some((t, Set(t, id.name.toLowerCase)))
      case _ => None
    }

  /** An inner-join condition equivalent to `USING (cols)`: a
    * conjunction of `EqualTo` where both sides are QUALIFIED
    * attributes ending in the SAME column name, one side qualified by
    * the LEFT subtree's tables/aliases and the other by the RIGHT
    * table's. Both qualifiers are REQUIRED and must name opposite
    * sides: `ON f.a = f.a` (a typo for `f.a = d.a`) is a not-null
    * cross join, and an equality binding two LEFT tables leaves the
    * right one unconstrained — either, matched as USING, would serve
    * a different join's multiplicity. Unqualified spellings run
    * direct. Returns the lowercase using-column set. */
  private def usingEquivalent(cond: Expression, leftQuals: Set[String],
                              rightQuals: Set[String]): Option[Set[String]] = {
    def side(parts: Seq[String]): Option[Boolean] = // Some(isRight)
      if (parts.length != 2) None
      else if (rightQuals.contains(parts.head.toLowerCase)) Some(true)
      else if (leftQuals.contains(parts.head.toLowerCase)) Some(false)
      else None
    val cols = conjuncts(cond).map {
      case org.apache.spark.sql.catalyst.expressions.EqualTo(
            UnresolvedAttribute(l), UnresolvedAttribute(r))
          if l.last.equalsIgnoreCase(r.last) =>
        (side(l), side(r)) match {
          case (Some(a), Some(b)) if a != b => Some(l.last.toLowerCase)
          case _ => None
        }
      case _ => None
    }
    if (cols.forall(_.isDefined)) Some(cols.flatten.toSet) else None
  }

  /** A bare one-part relation, or a LEFT-DEEP chain of inner joins of
    * bare relations — `f JOIN d1 USING (c1) JOIN d2 ON f.k = d2.k
    * ...` — returns (deepest-left table, one (dim, join-col set) per
    * join in order, the strippable qualifier set: every table name
    * and alias in the FROM). */
  private def sourceOf(p: LogicalPlan)
      : Option[(String, Seq[(String, Set[String])], Set[String])] =
    p match {
      case j: Join =>
        val rightRel = relationOf(j.right)
        val leftSrc = sourceOf(j.left)
        (leftSrc, rightRel) match {
          case (Some((src, joins, quals)), Some((dim, dimQuals))) =>
            val usingCols = (j.joinType, j.condition) match {
              case (UsingJoin(Inner, cols), None) =>
                Some(cols.map(_.toLowerCase).toSet)
              case (Inner, Some(cond)) =>
                usingEquivalent(cond, quals, dimQuals)
              case _ => None
            }
            usingCols.map(cols => (src, joins :+ (dim, cols), quals ++ dimQuals))
          case _ => None
        }
      case other => relationOf(other).map { case (t, q) => (t, Nil, q) }
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
      srcAndWhere.flatMap { case ((srcName, joins, quals), where0) =>
        {
          // strip 2-part qualifiers naming a FROM table/alias
          // (`f.price` → `price`): the view stores bare columns, and a
          // bare name over the view is exactly as (un)ambiguous as the
          // qualified one over the join — the schema-equality guard
          // abstains on anything the analyzer would resolve differently
          def strip(e: Expression): Expression = e.transform {
            case UnresolvedAttribute(parts)
                if parts.length == 2 &&
                  quals.contains(parts.head.toLowerCase) =>
              UnresolvedAttribute(Seq(parts.last))
          }
          val where = where0.map(strip)
          val aggExprs = a.aggregateExpressions
            .map(strip(_).asInstanceOf[
              org.apache.spark.sql.catalyst.expressions.NamedExpression])
          // GROUP BY <ordinal> — resolve against the select list like
          // the analyzer would. ONLY UnresolvedOrdinal qualifies: the
          // parser emits it iff spark.sql.groupByOrdinal=true; a bare
          // integer Literal reaches here exactly when that conf is
          // false, where direct execution groups by the CONSTANT — an
          // ordinal substitution would serve an answer the direct
          // plan would not produce
          def ordinal(e: Expression): Option[Int] = e match {
            case UnresolvedOrdinal(i) => Some(i)
            case _ => None
          }
          val groupExprs = a.groupingExpressions.map(strip).map { e =>
            ordinal(e).filter(i => i >= 1 && i <= aggExprs.length)
              .map(i => aggExprs(i - 1) match {
                case Alias(c, _) => c
                case UnresolvedAlias(c, _) => c
                case x => x
              }).getOrElse(e)
          }
          // group keys: bare columns or derived expressions — matched
          // per candidate view later, so keep the normalized trees.
          // Aggregate calls can never be group keys; reject early.
          val groupEs = groupExprs.map(norm)
          if (groupEs.exists(_.exists {
              case f: UnresolvedFunction => parseMeasure(f).isDefined
              case _ => false
            })) return None
          val outs = aggExprs.map {
            case UnresolvedAttribute(Seq(n)) =>
              Some(GRef(norm(UnresolvedAttribute(Seq(n))), Some(n), None))
            case Alias(child, name) =>
              parseMeasure(child) match {
                case Some((fn, arg)) => Some(Meas(fn, arg, name))
                case None => child match {
                  case UnresolvedAttribute(Seq(n)) =>
                    Some(GRef(norm(UnresolvedAttribute(Seq(n))),
                      Some(n), Some(name)))
                  case e if !e.exists {
                      case f: UnresolvedFunction =>
                        parseMeasure(f).isDefined || f.isDistinct
                      case _: SubqueryExpression => true
                      case _ => false
                    } =>
                    // an ALIASED expression — a group key candidate
                    Some(GRef(norm(e), None, Some(name)))
                  case _ => None
                }
              }
            case _ => None
          }
          // empty grouping = global aggregate (one row) — allowed as
          // long as there is at least one measure to translate
          if (outs.exists(_.isEmpty)) None
          else {
            val o = outs.flatten
            if (o.isEmpty) None
            else {
              // every selected group ref must actually be grouped on,
              // and expression keys must be aliased (their direct
              // output name is not reproducible)
              val refsOk = o.forall {
                case GRef(e, typed, alias) =>
                  groupEs.contains(e) && (typed.isDefined || alias.isDefined)
                case _: Meas => true
              }
              // HAVING / ORDER BY: aggregate refs become column refs
              // (hidden measures allocated as needed); remaining
              // attributes must be named group keys or output aliases
              val refs = new AggRefs(o)
              val having = havingRaw.map(h => refs.translate(strip(h)))
              val sort = orderRaw.map(so => refs.translate(strip(so.child))
                .map((_, so.direction == Ascending,
                  so.nullOrdering == NullsFirst)))
              val shape0 = Shape(srcName, where, groupEs, o, joins,
                having.flatten, refs.hidden.toSeq, sort.flatten, limit)
              val visible = groupEs.indices
                .flatMap(shape0.keyName).map(_.toLowerCase).toSet ++
                o.collect { case Meas(_, _, out) => out.toLowerCase } ++
                refs.hidden.map(_.out.toLowerCase)
              def attrsOk(e: Expression): Boolean =
                e.collect { case UnresolvedAttribute(p) => p }.forall(p =>
                  p.length == 1 && visible.contains(p.head.toLowerCase))
              val translatedOk =
                having.forall(_.exists(attrsOk)) &&
                  sort.forall(_.exists { case (e, _, _) => attrsOk(e) })
              if (refsOk && translatedOk) Some(shape0)
              else None
            }
          }
        }
      }
    }

  // ---- candidate matching ------------------------------------------------

  /** A dim join the query omits is droppable iff RELY constraints
    * prove it key-preserving for the fact: a PRIMARY KEY / UNIQUE on
    * exactly the dim's join columns (the join cannot duplicate fact
    * rows) AND a declared FOREIGN KEY from the fact over those
    * columns (non-NULL children by graft's FK declaration contract —
    * the inner join cannot drop fact rows). Metadata-file reads only,
    * no jobs — same probe-cost discipline as the def cache. */
  private def keyPreserving(store: TableStore, fact: String, dim: String,
                            joinColsLc: Set[String]): Boolean =
    try {
      store.uniqueKeys(dim)
        .exists(_.map(_.toLowerCase).toSet == joinColsLc) &&
      store.foreignKeys(fact).exists { case (_, cols, ref, refCols) =>
        ref.equalsIgnoreCase(dim) &&
          cols.map(_.toLowerCase).toSet == joinColsLc &&
          refCols.map(_.toLowerCase).toSet == joinColsLc
      }
    } catch { case NonFatal(_) => false }

  private def satisfies(s: MaterializedView.Surface, m: Meas): Boolean = {
    def in(cols: Seq[String], c: String) =
      cols.exists(_.equalsIgnoreCase(c))
    m match {
      case Meas("count_star", _, _) => true
      case Meas("count" | "sum" | "avg", Some(c), _) =>
        in(s.storedSumCols, c)
      case Meas("min", Some(c), _) => in(s.minCols, c)
      case Meas("max", Some(c), _) => in(s.maxCols, c)
      // count(DISTINCT k) is exact from the view iff k is an IDENTITY
      // group column: the consolidated rows enumerate exactly the
      // surviving group combinations, so distinct-k-per-coarser-group
      // is a count over them (a derived key's name could shadow an
      // unrelated source column — identity only)
      case Meas("count_distinct", Some(c), _) =>
        in(s.identityGroupCols, c)
      // approx_count_distinct(c) from the view's KMV sketch — the
      // caller additionally gates this on the session opt-in
      // (spark.graft.mv.rewrite.approxDistinct), because the served
      // estimate is KMV, not Spark's HLL
      case Meas("approx_distinct", Some(c), _) =>
        in(s.distinctCols, c)
      case _ => false
    }
  }

  /** The view's group keys as (normalized parsed expression, column
    * name) for the NON-identity (derived) ones, plus the identity
    * column-name set. */
  private def viewKeys(spark: SparkSession, s: MaterializedView.Surface)
      : (Seq[(Expression, String)], Set[String]) = {
    if (s.groupExprs.isEmpty)
      (Nil, s.groupCols.map(_.toLowerCase).toSet)
    else {
      val pairs = s.groupExprs.zip(s.groupCols)
      val (identity, derived) = pairs.partition { case (e, c) =>
        e.equalsIgnoreCase(c) }
      (derived.map { case (e, c) =>
        (norm(spark.sessionState.sqlParser.parseExpression(e)), c) },
        identity.map(_._2.toLowerCase).toSet)
    }
  }

  /** View-filter subsumption: the view's conjuncts must appear
    * verbatim (normalized) among the query's; what remains must be
    * expressible over VIEW rows — any subtree equal to a derived
    * group expression substitutes to that group's column, and every
    * surviving attribute must be an IDENTITY group column (a source
    * column the view carries verbatim; matching a derived column's
    * NAME would be wrong, the source may hold an unrelated column of
    * that name). Returns the substituted residual conjuncts, or None
    * when the view cannot serve this WHERE. */
  private def residualOf(spark: SparkSession, s: MaterializedView.Surface,
                         where: Option[Expression]): Option[Seq[Expression]] = {
    val qConj = where.map(w => conjuncts(norm(w))).getOrElse(Nil)
    val vConj = s.filterSql
      .map(f => conjuncts(norm(
        spark.sessionState.sqlParser.parseExpression(f))))
      .getOrElse(Nil)
    if (!vConj.forall(qConj.contains)) return None
    val residual0 = qConj.filterNot(vConj.contains)
    val (derived, identityLc) = viewKeys(spark, s)
    // substitute derived-key subtrees via a marker so the attribute
    // check below can tell "introduced by us" from "user-written"
    val marker = derived.zipWithIndex.map { case ((e, c), i) =>
      (e, s"__gx_$i", c) }
    val residual = residual0.map(e => e.transform {
      case sub if marker.exists(_._1 == sub) =>
        UnresolvedAttribute(Seq(marker.find(_._1 == sub).get._2))
    })
    val markerNames = marker.map(_._2).toSet
    val ok = residual.forall { e =>
      val attrs = e.collect { case UnresolvedAttribute(parts) => parts }
      attrs.forall(p => p.length == 1 &&
        (identityLc.contains(p.head) || markerNames.contains(p.head))) &&
        !e.exists {
          case _: SubqueryExpression | _: UnresolvedFunction => true
          case _ => false
        }
    }
    if (!ok) return None
    // markers → the view's real column names for execution
    Some(residual.map(_.transform {
      case UnresolvedAttribute(Seq(m)) if markerNames.contains(m) =>
        UnresolvedAttribute(Seq(marker.find(_._2 == m).get._3))
    }))
  }

  /** Map each query group key to a view group column: a bare column
    * matches an IDENTITY view key of that name; an expression matches
    * a derived view key by normalized-tree equality. None when any
    * key has no home — the view cannot serve this grouping. */
  private def gmapFor(spark: SparkSession, s: MaterializedView.Surface,
                      shape: Shape): Option[Seq[String]] = {
    val (derived, identityLc) = viewKeys(spark, s)
    val mapped = shape.groupEs.map {
      case a @ UnresolvedAttribute(Seq(n)) =>
        if (identityLc.contains(n))
          s.groupCols.find(_.equalsIgnoreCase(n))
        else derived.collectFirst { case (e, c) if e == a => c }
      case e => derived.collectFirst { case (de, c) if de == e => c }
    }
    if (mapped.forall(_.isDefined)) Some(mapped.map(_.get)) else None
  }

  // ---- the rewrite -------------------------------------------------------

  private def build(store: TableStore, s: MaterializedView.Surface,
                    shape: Shape, residual: Seq[Expression],
                    gmap: Seq[String]): DataFrame = {
    import MaterializedView.{cntCol, maxCol, minCol, sumCol, CntCol}
    def actual(cols: Seq[String], lc: String): String =
      cols.find(_.equalsIgnoreCase(lc)).get
    val base = residual.foldLeft(
      MaterializedView.consolidatedAdditive(store, s.mv))(
      (d, e) => d.where(expr(e.sql)))
    val groupCols = gmap.map(col)
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
      // consolidated rows are distinct surviving group combos, so a
      // count of distinct identity-key values over them is EXACT —
      // and countDistinct ignores NULL keys, same as SQL
      case Meas("count_distinct", Some(c), out) =>
        countDistinct(col(actual(s.groupCols, c))).as(out)
      // the stored KMV sketches merge losslessly (k smallest of the
      // union), so a coarser grouping re-estimates exactly as a
      // per-query sketch would; cast long to match Spark's
      // approx_count_distinct schema. Opt-in only — the estimate is
      // KMV, deterministic, not Spark's HLL value.
      case Meas("approx_distinct", Some(c), out) =>
        val k = s.kmvK
        val merged = slice(array_sort(array_distinct(flatten(
          collect_list(col(MaterializedView.kmvCol(
            actual(s.distinctCols, c))))))), 1, k)
        when(size(merged) < k, size(merged).cast("long"))
          .otherwise(round(lit((k - 1).toDouble) *
            graft.ops.Sketches.Space / element_at(merged, k))
            .cast("long"))
          .as(out)
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
    // group keys leave the agg under their VIEW column names; HAVING/
    // ORDER BY and the final projection speak the QUERY's names —
    // rename where they differ
    val keyed = gmap.zipWithIndex.foldLeft(agged) { case (df, (v, i)) =>
      shape.keyName(i).filterNot(_.equalsIgnoreCase(v))
        .fold(df)(df.withColumnRenamed(v, _))
    }
    def keyNameOrView(i: Int): String = shape.keyName(i).getOrElse(gmap(i))
    val havinged = shape.having.foldLeft(keyed)((d, h) => d.where(expr(h.sql)))
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
      case GRef(e, typed, alias) =>
        val i = shape.groupEs.indexOf(e)
        col(keyNameOrView(i)).as(alias.orElse(typed).getOrElse(gmap(i)))
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
          // SAME inner-join star — table set equal (order-free, inner
          // joins commute) and the join-column sets equal as a
          // multiset (join multiplicity makes any other pairing
          // wrong). USING and ON spellings land here identically.
          val sourceOk = {
            // each dim is bound by ITS OWN column set — the pairing
            // must match per table, never as two independently
            // sorted multisets (dims sharing column names could
            // otherwise swap bindings and serve a different join's
            // multiplicity). Same fact: every QUERY join must match
            // the view's binding for that dim; view dims the query
            // does NOT join are tolerated iff provably
            // KEY-PRESERVING from RELY constraints (classic
            // Goldstein–Larson view subsumption): a PK/UNIQUE on the
            // dim's join columns means the join cannot duplicate
            // fact rows, and a declared FK from the fact (non-NULL
            // child columns by graft's FK contract) means the inner
            // join cannot drop them — so ignoring the dim's columns
            // re-aggregates to the query's exact answer. Ambiguity
            // is structurally impossible: a column name shared
            // between the fact and a dim would have failed the
            // view's own creation fold, and a query naming a
            // missing-dim-only column fails the direct-analysis
            // schema guard. Different fact: only the symmetric
            // 2-table case commutes trivially (one USING set binds
            // both sides), so only that swap is accepted.
            val qMap = shape.joins
              .map { case (t, cs) => t -> cs }.toMap
            val vMap = s.dims.map(_.toLowerCase)
              .zip(s.dimJoinCols.map(_.map(_.toLowerCase).toSet)).toMap
            val sameFact = s.src.equalsIgnoreCase(shape.src)
            if (shape.joins.isEmpty && !s.joined)
              s.src.equalsIgnoreCase(shape.src)
            else if (sameFact && s.joined) {
              val vOrig = s.dims.map(d => d.toLowerCase -> d).toMap
              // duplicate table names on either side would collapse in
              // the maps and hide a join whose multiplicity matters —
              // subsumption reasons per-distinct-table only
              val noDupes =
                shape.joins.map(_._1).distinct.size == shape.joins.size &&
                  s.dims.map(_.toLowerCase).distinct.size == s.dims.size
              noDupes &&
                qMap.forall { case (t, cs) => vMap.get(t).contains(cs) } &&
                (vMap.keySet -- qMap.keySet).forall(dim =>
                  keyPreserving(store, s.src, vOrig(dim), vMap(dim)))
            }
            else if (s.joined)
              shape.joins.size == 1 && s.dims.size == 1 &&
                shape.src == s.dims.head.toLowerCase &&
                qMap.get(s.src.toLowerCase) ==
                  vMap.get(s.dims.head.toLowerCase)
            else false
          }
          val approxOk = spark.conf
            .get("spark.graft.mv.rewrite.approxDistinct", "false").toBoolean
          sourceOk && s.fresh &&
            (shape.outs.collect { case m: Meas => m } ++ shape.hidden)
              .forall(m => satisfies(s, m) &&
                (m.fn != "approx_distinct" || approxOk))
        }
        .sortBy(_.groupCols.length) // cheapest first: fewest view groups
      // the schema-equality guard's DIRECT analysis happens at most
      // once per statement — lazily, shared across every candidate —
      // so a dashboard SELECT over a store with N views pays one
      // structural match plus one analysis, never N schema probes
      lazy val directSchema = {
        MetaMetrics.mvDirectAnalyses.incrementAndGet()
        spark.sql(sql).schema.map(f => (f.name, f.dataType))
      }
      candidates.iterator.flatMap { s =>
        for {
          gmap <- gmapFor(spark, s, shape)
          residual <- residualOf(spark, s, shape.where)
          cand = build(store, s, shape, residual, gmap)
          // abstain unless the rewrite reproduces the direct plan's
          // analyzed schema exactly (names + types)
          if directSchema == cand.schema.map(f => (f.name, f.dataType))
        } yield {
          hits.incrementAndGet()
          lastServed = Some(s.mv)
          cand
        }
      }.nextOption()
    } catch { case NonFatal(_) => None }
}
