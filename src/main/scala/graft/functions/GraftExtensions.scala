package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: build sessions with
  * `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.functions.GraftExtensions`) and the
  * graft native functions are available in SQL from the first query —
  * the registration path a deployment uses, vs. the per-session
  * `GraftFunctions.register` convenience.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductF].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProductF(exprs(0), exprs(1))))
    // hand-written HOF dot products silently become the native
    // codegen'd expression (see RewriteHofDotProduct)
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
    // row-level SQL (MERGE/UPDATE/DELETE) on catalog-addressed graft
    // tables — the resolved plans compile onto the store's atomic
    // commit machinery (see graft.plans.GraftDml)
    ext.injectResolutionRule(session => graft.plans.GraftDmlRule(session))
    ext.injectPlannerStrategy(_ => graft.plans.GraftDmlStrategy)
  }
}
