package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteAction, LogicalPlan, MergeIntoTable}

/** SQL-text front door for the one statement Spark can parse but not
  * execute without a v2 row-level-operation catalog: the reference's
  * `MERGE INTO target USING updates ON t.pk = u.pk WHEN MATCHED THEN
  * DELETE` (merge_sql_stmnt, icberg/iceberg_tables.py:45-50).
  *
  * We reuse Catalyst's parser (no regex dialect): `parsePlan` yields a
  * `MergeIntoTable`; the delete-matched form is compiled onto the graft
  * engine — left-anti join + one atomic overwrite commit (CdcMerge/
  * TableStore). Any other statement delegates to `spark.sql` untouched.
  */
object GraftSql {

  /** Execute SQL against graft tables: MERGE-delete runs on the store;
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
      m.matchedActions.nonEmpty &&
      m.notMatchedActions.isEmpty && m.notMatchedBySourceActions.isEmpty,
      "graft MERGE supports the WHEN MATCHED THEN DELETE form " +
        "(icberg/iceberg_tables.py:45-50); use CdcIngest for upserts")
    require(m.matchedActions.collect { case DeleteAction(Some(_)) => () }.isEmpty,
      "conditional WHEN MATCHED AND ... THEN DELETE is not supported")

    val target = tableName(m.targetTable)
    val source = tableName(m.sourceTable)
    // every conjunct must be a same-name equi-join — a dropped non-equi
    // conjunct would silently delete MORE rows than the SQL specifies
    val keys = equiKeys(m.mergeCondition).getOrElse(
      throw new IllegalArgumentException(
        s"merge condition must be AND-ed same-column equi-joins, " +
          s"got ${m.mergeCondition.sql}"))

    val updates = spark.table(source)
    val merged = CdcMerge.deleteMatched(store.read(target), updates, keys)
    store.overwrite(target, merged)
    store.read(target)
  }

  private def tableName(plan: LogicalPlan): String = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    plan.collectFirst {
      case r: UnresolvedRelation => r.multipartIdentifier.last
    }.getOrElse(throw new IllegalArgumentException(
      s"cannot resolve table from ${plan.getClass.getSimpleName}"))
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
