package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Codegen'd sketch probes that reference their sketch through a
  * BROADCAST handle, not a plan literal: the expression tree carries
  * only the handle (bytes), the bits ship once per executor over the
  * torrent broadcast, and the generated code calls the sketch
  * directly — no UDF boxing, no codegen fence, and none of the
  * driver-side tree-copy cost a megabyte-sized literal would add to
  * every optimizer rule (measured: embedding a 1.2 MB bloom as a
  * `Literal` cost ~0.5 s of planning per query at sf0.1 — the
  * broadcast-handle form keeps the plan small AND the probe
  * codegen'd). */
object SketchExpressions // scaladoc anchor

/** `bloom.mightContainLong(child)` as a native predicate; `child` is
  * the pre-hashed 64-bit key (xxhash64 — the same contract Spark's
  * injected runtime filters use). Null-intolerant: NULL hash yields
  * NULL (callers coalesce to the branch NULL keys belong in). */
case class BloomMightContainLong(child: Expression,
                                 bf: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom probe needs a long (pre-hashed) key, got " +
        child.dataType.catalogString)

  override protected def nullSafeEval(v: Any): Any =
    bf.value.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBc", bf,
      classOf[Broadcast[_]].getName)
    defineCodeGen(ctx, ev, c =>
      s"((org.apache.spark.util.sketch.BloomFilter)$ref.value())" +
        s".mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd count-min-sketch probe: `estimateCount(key) >= minCount`
  * as a native Catalyst predicate, so the heavy-hitter prefilter stays
  * inside WholeStageCodegen instead of breaking the pipeline at a
  * Scala UDF (one virtual call + boxing per corpus row — exactly the
  * hot path a 100 TB token stream cannot afford). Null-intolerant:
  * a NULL key yields NULL (callers prefilter `isNotNull`, matching
  * SQL aggregate semantics — NULLs are never counted, so they can
  * never be heavy hitters). */
case class CmsAtLeast(child: Expression, cms: Broadcast[CountMinSketch],
                      minCount: Long)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms probe needs a string key, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(v: Any): Any =
    cms.value.estimateCount(v.asInstanceOf[UTF8String].toString) >= minCount

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsBc", cms,
      classOf[Broadcast[_]].getName)
    defineCodeGen(ctx, ev, c =>
      s"((org.apache.spark.util.sketch.CountMinSketch)$ref.value())" +
        s".estimateCount($c.toString()) >= ${minCount}L")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
