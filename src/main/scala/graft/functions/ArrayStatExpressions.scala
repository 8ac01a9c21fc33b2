package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression for the repetition-metric hot path:
  * the highest multiplicity of any element in a string array.
  *
  * Replaces `aggregate(array_sort(arr), ...)` — an O(n log n) sort
  * followed by an interpreted higher-order fold (HOFs don't codegen;
  * every element pays lambda dispatch and a struct allocation) — with
  * one O(n) codegen'd hash-count loop. Multiplicity only needs equal
  * elements GROUPED, not ordered, so dropping the sort changes
  * nothing: the result is identical, including the HOF's null
  * semantics (`x <=> prev` made null elements count as a run of
  * nulls; here they count under one null key). The Gopher repetition
  * filters run this per document over token/bigram/trigram arrays —
  * at 100 TB it's billions of per-row evaluations, the same
  * drop-to-codegen rationale as [[DotProductF]] (SURVEY §7.4).
  */
case class MaxMultiplicityF(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | org.apache.spark.sql.types.NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_max_mult expects array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_max_mult"

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = new java.util.HashMap[AnyRef, java.lang.Long](Math.max(16, n))
    var best = 0L
    var i = 0
    while (i < n) {
      val k: AnyRef = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      val prev = m.get(k)
      val c = if (prev == null) 1L else prev.longValue() + 1L
      m.put(k, java.lang.Long.valueOf(c))
      if (c > best) best = c
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one map per operator instance, cleared per row (no per-row alloc);
    // raw types: Janino compiles no generics
    val map = ctx.addMutableState("java.util.HashMap", "graftMmMap",
      v => s"$v = new java.util.HashMap();")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val nc = ctx.freshName("nc")
      val best = ctx.freshName("best")
      s"""
         |int $n = $a.numElements();
         |$map.clear();
         |long $best = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  Object $k = $a.isNullAt($i) ? null : (Object) $a.getUTF8String($i);
         |  Object $c = $map.get($k);
         |  long $nc = ($c == null) ? 1L : ((java.lang.Long) $c).longValue() + 1L;
         |  $map.put($k, java.lang.Long.valueOf($nc));
         |  if ($nc > $best) $best = $nc;
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MaxMultiplicityF =
    copy(child = newChild)
}

/** Distinct-element count of a string array — the codegen companion
  * to [[MaxMultiplicityF]] for the duplicated-trigram fraction
  * (`1 - ndistinct/size`), replacing `size(array_distinct(...))`
  * which allocates the deduplicated array only to take its length. */
case class ArrayNDistinctF(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | org.apache.spark.sql.types.NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ndistinct expects array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ndistinct"

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val s = new java.util.HashSet[AnyRef](Math.max(16, n))
    var i = 0
    while (i < n) {
      s.add(if (arr.isNullAt(i)) null else arr.getUTF8String(i))
      i += 1
    }
    s.size().toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val set = ctx.addMutableState("java.util.HashSet", "graftNdSet",
      v => s"$v = new java.util.HashSet();")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |$set.clear();
         |for (int $i = 0; $i < $n; $i++) {
         |  $set.add($a.isNullAt($i) ? null : (Object) $a.getUTF8String($i));
         |}
         |${ev.value} = (long) $set.size();
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ArrayNDistinctF =
    copy(child = newChild)
}
