package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram construction over a token array — the single
  * hottest string primitive in the text pipeline (shingles feed
  * MinHash, Jaccard, decontamination, span dedup, CDC chunking, the
  * LM metrics, ...).
  *
  * Replaces the zip_with-fold formulation (n-1 interpreted
  * higher-order zips, each allocating a full intermediate array and
  * paying lambda dispatch per element) with ONE loop that emits each
  * gram as a single UTF8String concat. Bit-identical semantics,
  * including the edges the fold had:
  *   - n <= 1: the tokens themselves, minus empty/null entries;
  *   - fewer than n tokens: ONE whole-text gram (nulls skipped,
  *     concat_ws-style), or no grams for blank text;
  *   - a null token makes each gram containing it null (n >= 2),
  *     exactly as `concat` propagated nulls through the zips.
  *
  * The codegen body is one static call — the loop runs as compiled
  * JVM code either way; what whole-stage codegen buys is keeping the
  * surrounding projection fused (no fallback row materialization).
  */
case class NgramsF(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | org.apache.spark.sql.types.NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ngrams expects array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_ngrams"

  override protected def nullSafeEval(a: Any): Any =
    NgramsF.compute(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NgramsF.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramsF =
    copy(child = newChild)
}

object NgramsF {
  private val Space = UTF8String.fromString(" ")

  /** One gram = tokens[start..start+n-1] joined by a space; null if
    * any part is null (concat's null propagation through the zips). */
  private def gram(arr: ArrayData, start: Int, n: Int): UTF8String = {
    val parts = new Array[UTF8String](2 * n - 1)
    var j = 0
    while (j < n) {
      if (arr.isNullAt(start + j)) return null
      parts(2 * j) = arr.getUTF8String(start + j)
      if (j < n - 1) parts(2 * j + 1) = Space
      j += 1
    }
    UTF8String.concat(parts.toIndexedSeq: _*)
  }

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (n <= 1) {
      // the tokens minus null/empty entries (filter(s => s =!= ""))
      val out = new java.util.ArrayList[AnyRef](len)
      var i = 0
      while (i < len) {
        if (!arr.isNullAt(i)) {
          val s = arr.getUTF8String(i)
          if (s.numBytes() > 0) out.add(s)
        }
        i += 1
      }
      new GenericArrayData(out.toArray)
    } else if (len >= n) {
      val out = new Array[Any](len - n + 1)
      var i = 0
      while (i < out.length) {
        out(i) = gram(arr, i, n)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      // short doc: one whole-text gram, concat_ws-style (skip nulls),
      // none if the result is empty
      val parts = new java.util.ArrayList[UTF8String](len)
      var i = 0
      while (i < len) {
        if (!arr.isNullAt(i)) parts.add(arr.getUTF8String(i))
        i += 1
      }
      val joined = UTF8String.concatWs(Space,
        parts.toArray(new Array[UTF8String](parts.size())).toIndexedSeq: _*)
      if (joined == null || joined.numBytes() == 0)
        new GenericArrayData(Array.empty[Any])
      else new GenericArrayData(Array[Any](joined))
    }
  }
}
