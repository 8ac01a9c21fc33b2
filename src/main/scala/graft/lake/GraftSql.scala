package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteAction, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias}
import org.apache.spark.sql.functions.{col, expr, lit}

/** SQL-text front door for the one statement Spark can parse but not
  * execute without a v2 row-level-operation catalog: MERGE INTO — the
  * reference's merge_sql_stmnt (icberg/iceberg_tables.py:45-50) plus
  * the natural extensions a user hits first when growing past it.
  *
  * We reuse Catalyst's parser (no regex dialect): `parsePlan` yields a
  * `MergeIntoTable`, compiled onto the graft engine as joins + ONE
  * atomic commit. Supported forms:
  *
  *   - `WHEN MATCHED [AND <cond>] THEN DELETE` — matched keys whose
  *     joined (target, source) row satisfies the condition are removed
  *     via a left-anti join.
  *   - `WHEN NOT MATCHED [AND <cond>] THEN INSERT *` — source rows
  *     whose key is absent from the (pre-merge) target are appended
  *     by name (schema evolution tolerated, as `append` does).
  *
  * Any other statement delegates to `spark.sql` untouched; UPDATE
  * actions are rejected with a pointer at CdcIngest, whose dedup/merge
  * pipeline is the engine's upsert path.
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
    require(m.matchedActions.forall(_.isInstanceOf[DeleteAction]) &&
      m.notMatchedActions.forall(_.isInstanceOf[InsertStarAction]) &&
      m.notMatchedBySourceActions.isEmpty &&
      (m.matchedActions.nonEmpty || m.notMatchedActions.nonEmpty),
      "graft MERGE supports WHEN MATCHED [AND <cond>] THEN DELETE and " +
        "WHEN NOT MATCHED [AND <cond>] THEN INSERT *; use CdcIngest for upserts")

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

    // Action conditions re-enter as Columns via their generated SQL and
    // resolve against the statement's own aliases (t.x / u.y).
    def anyCond(conds: Seq[Option[Expression]]): Column =
      conds.map(_.map(e => expr(e.sql)).getOrElse(lit(true))).reduce(_ || _)

    val afterDelete =
      if (m.matchedActions.isEmpty) dest
      else {
        val delCond = anyCond(m.matchedActions.collect {
          case DeleteAction(c) => c
        })
        val joinCond = keys.map(k => col(s"$tAlias.$k") === col(s"$uAlias.$k"))
          .reduce(_ && _)
        val delKeys = dest.alias(tAlias).join(updates.alias(uAlias), joinCond)
          .where(delCond)
          .select(keys.map(k => col(s"$tAlias.$k").as(k)): _*)
          .distinct()
        dest.join(delKeys, keys, "left_anti")
      }

    val result =
      if (m.notMatchedActions.isEmpty) afterDelete
      else {
        val insCond = anyCond(m.notMatchedActions.collect {
          case InsertStarAction(c) => c
        })
        // NOT MATCHED is judged against the pre-merge target, so the
        // anti join runs on `dest`, not `afterDelete`
        val inserts = updates.alias(uAlias)
          .join(dest.select(keys.map(col): _*).distinct(), keys, "left_anti")
          .where(insCond)
        afterDelete.unionByName(inserts, allowMissingColumns = true)
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
