package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteAction, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction}
import org.apache.spark.sql.functions.{col, expr, lit, when}

/** SQL-text front door for the one statement Spark can parse but not
  * execute without a v2 row-level-operation catalog: MERGE INTO — the
  * reference's merge_sql_stmnt (icberg/iceberg_tables.py:45-50) plus
  * the natural extensions a user hits first when growing past it.
  *
  * We reuse Catalyst's parser (no regex dialect): `parsePlan` yields a
  * `MergeIntoTable`, compiled onto the graft engine as joins + ONE
  * atomic commit. Supported forms:
  *
  *   - `WHEN MATCHED [AND <cond>] THEN DELETE` — matched rows whose
  *     joined (target, source) row satisfies the condition are removed.
  *   - `WHEN MATCHED [AND <cond>] THEN UPDATE SET c = expr, ...` and
  *     `UPDATE SET *` — matched rows are rewritten with the
  *     assignments (un-assigned target columns carry through; `SET *`
  *     assigns every target column from the same-named source column).
  *   - `WHEN NOT MATCHED [AND <cond>] THEN INSERT *` — source rows
  *     whose key is absent from the (pre-merge) target are appended
  *     by name (schema evolution tolerated, as `append` does).
  *
  * Matched actions follow SQL MERGE semantics: evaluated in
  * declaration order per matched row, first satisfied condition wins;
  * a matched row satisfying no action carries through unchanged. As
  * one plan: inner-join target×source to resolve each matched row's
  * action, anti-join the acted keys out of the target, union the
  * rewritten update rows and the not-matched inserts, ONE atomic
  * commit. Each leg is a shuffle-bounded join on the merge keys — no
  * per-row driver work, broadcast when the source is small.
  *
  * The source is assumed key-unique (a CDC-deduped batch — the P5
  * output); like Delta/Iceberg, multiple source matches for one
  * target row make UPDATE ambiguous.
  *
  * Any other statement delegates to `spark.sql` untouched.
  */
object GraftSql {

  /** Execute SQL against graft tables: MERGE runs on the store;
    * everything else is plain `spark.sql`. Returns the affected table
    * contents for MERGE, the query result otherwise. */
  def execute(spark: SparkSession, store: TableStore, sql: String): DataFrame =
    spark.sessionState.sqlParser.parsePlan(sql) match {
      case m: MergeIntoTable => executeMerge(spark, store, m)
      case _ => spark.sql(sql)
    }

  private def executeMerge(spark: SparkSession, store: TableStore,
                           m: MergeIntoTable): DataFrame = {
    require(m.matchedActions.forall(a => a.isInstanceOf[DeleteAction] ||
        a.isInstanceOf[UpdateAction] || a.isInstanceOf[UpdateStarAction]) &&
      m.notMatchedActions.forall(_.isInstanceOf[InsertStarAction]) &&
      m.notMatchedBySourceActions.isEmpty &&
      (m.matchedActions.nonEmpty || m.notMatchedActions.nonEmpty),
      "graft MERGE supports WHEN MATCHED [AND <cond>] THEN DELETE | " +
        "UPDATE SET ... | UPDATE SET *, and WHEN NOT MATCHED [AND <cond>] " +
        "THEN INSERT *")

    val target = tableName(m.targetTable)
    val source = tableName(m.sourceTable)
    val tAlias = aliasOf(m.targetTable).getOrElse(target)
    val uAlias = aliasOf(m.sourceTable).getOrElse(source)
    // every conjunct must be a same-name equi-join — a dropped non-equi
    // conjunct would silently delete MORE rows than the SQL specifies
    val keys = equiKeys(m.mergeCondition).getOrElse(
      throw new IllegalArgumentException(
        s"merge condition must be AND-ed same-column equi-joins, " +
          s"got ${m.mergeCondition.sql}"))

    val dest = store.read(target)
    val updates = spark.table(source)

    // Action conditions and assignment values re-enter as Columns via
    // their generated SQL and resolve against the statement's own
    // aliases (t.x / u.y).
    def condOf(c: Option[Expression]): Column =
      c.map(e => expr(e.sql)).getOrElse(lit(true))

    val survivors =
      if (m.matchedActions.isEmpty) dest
      else {
        val joinCond = keys.map(k => col(s"$tAlias.$k") === col(s"$uAlias.$k"))
          .reduce(_ && _)
        // one inner join resolves every matched row's action: the
        // first action (declaration order) whose condition holds
        val actConds = m.matchedActions.map {
          case DeleteAction(c) => condOf(c)
          case UpdateAction(c, _, _) => condOf(c)
          case UpdateStarAction(c) => condOf(c)
        }
        val act = actConds.zipWithIndex
          .foldLeft(lit(null).cast("int")) { case (acc, (c, i)) =>
            when(acc.isNotNull, acc).otherwise(when(c, lit(i)))
          }
        val matched = dest.alias(tAlias).join(updates.alias(uAlias), joinCond)
          .withColumn("__act", act)
          .where(col("__act").isNotNull)
        // target rows whose action fired leave the table in one anti
        // join; deletes end there, updates re-enter rewritten
        val actedKeys = matched
          .select(keys.map(k => col(s"$tAlias.$k").as(k)): _*).distinct()
        val untouched = dest.join(actedKeys, keys, "left_anti")
        val rewritten = m.matchedActions.zipWithIndex.collect {
          case (UpdateAction(_, assigns, _), i) =>
            val byName = assigns.map { a =>
              val k = a.key match {
                case u: UnresolvedAttribute => u.nameParts.last
                case other => throw new IllegalArgumentException(
                  s"unsupported assignment target ${other.sql}")
              }
              k.toLowerCase -> expr(a.value.sql)
            }.toMap
            matched.where(col("__act") === i).select(dest.columns.toIndexedSeq
              .map(n => byName.getOrElse(n.toLowerCase,
                col(s"$tAlias.$n")).as(n)): _*)
          case (UpdateStarAction(_), i) =>
            matched.where(col("__act") === i).select(dest.columns.toIndexedSeq
              .map(n => col(s"$uAlias.$n").as(n)): _*)
        }
        rewritten.foldLeft(untouched)(
          (acc, upd) => acc.unionByName(upd, allowMissingColumns = true))
      }

    val result =
      if (m.notMatchedActions.isEmpty) survivors
      else {
        val insCond = m.notMatchedActions.collect {
          case InsertStarAction(c) => condOf(c)
        }.reduce(_ || _)
        // NOT MATCHED is judged against the pre-merge target, so the
        // anti join runs on `dest`, not `survivors`
        val inserts = updates.alias(uAlias)
          .join(dest.select(keys.map(col): _*).distinct(), keys, "left_anti")
          .where(insCond)
        survivors.unionByName(inserts, allowMissingColumns = true)
      }

    store.overwrite(target, result)
    store.read(target)
  }

  /** The merge compiles `spark.table(name)` / `store.read(name)` from
    * the NAME alone, so anything beyond a bare (optionally aliased)
    * relation — a subquery, a filter, a join — would silently run the
    * merge against the full underlying table, dropping the subquery's
    * predicates. Reject those loudly. */
  private def tableName(plan: LogicalPlan): String = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    plan match {
      case r: UnresolvedRelation => r.multipartIdentifier.last
      case SubqueryAlias(_, r: UnresolvedRelation) => r.multipartIdentifier.last
      case other => throw new IllegalArgumentException(
        s"graft MERGE requires a bare table or view name (got " +
          s"${other.getClass.getSimpleName}); register a temp view for " +
          "subquery sources")
    }
  }

  private def aliasOf(plan: LogicalPlan): Option[String] = plan.collectFirst {
    case a: SubqueryAlias => a.alias
  }

  /** Extract key column names from an AND-tree of `t.k = u.k`;
    * None if ANY conjunct is not a same-name equi-join. */
  private def equiKeys(cond: Expression): Option[Seq[String]] = cond match {
    case And(l, r) =>
      for (a <- equiKeys(l); b <- equiKeys(r)) yield a ++ b
    case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
        if a.nameParts.last == b.nameParts.last =>
      Some(Seq(a.nameParts.last))
    case _ => None
  }
}
