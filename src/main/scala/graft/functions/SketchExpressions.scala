package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Codegen'd count-min-sketch probe: `estimateCount(key) >= minCount`
  * as a native Catalyst predicate, so the heavy-hitter prefilter stays
  * inside WholeStageCodegen instead of breaking the pipeline at a
  * Scala UDF (one virtual call + boxing per corpus row — exactly the
  * hot path a 100 TB token stream cannot afford).
  *
  * The sketch rides the expression as a plan reference
  * (`ctx.addReferenceObj`), so it ships once per stage inside the
  * broadcast task binary — same distribution cost as an explicit
  * `sparkContext.broadcast`, without the driver-side handle.
  * Null-intolerant: a NULL key yields NULL (callers prefilter
  * `isNotNull`, matching SQL aggregate semantics — NULLs are never
  * counted, so they can never be heavy hitters). */
case class CmsAtLeast(child: Expression, cms: CountMinSketch, minCount: Long)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms probe needs a string key, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(v: Any): Any =
    cms.estimateCount(v.asInstanceOf[UTF8String].toString) >= minCount

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", cms,
      classOf[CountMinSketch].getName)
    defineCodeGen(ctx, ev, c =>
      s"$ref.estimateCount($c.toString()) >= ${minCount}L")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
