package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row winnowing fingerprints (Schleimer et al., SIGMOD'03): the
  * k smallest distinct polynomial window hashes of a document's token
  * array, as ONE scalar expression.
  *
  * The windowed formulation this replaces (posexplode → w `lead()`
  * terms over a doc-partitioned window → distinct → row_number ≤ k)
  * shuffles every token of the corpus twice to compute a per-document
  * value. Fingerprinting is row-local by definition, so the custom
  * expression computes the same k hashes inside the scan projection —
  * zero exchanges until the candidate-pair equi-join, and at 100 TB
  * the shuffle it deletes is the corpus's entire token stream.
  *
  * Arithmetic is kept bit-identical to the windowed form (and the
  * DuckDB oracle): token hash = first 12 hex chars of md5 as an
  * integer mod P (2^31-1); window hash = Σ_j (h_{i+j}·B^{w-1-j} mod P)
  * summed then mod P, B = 1000003; windows containing a null token
  * are dropped (`lead`'s null propagated through the sum); documents
  * shorter than w tokens have no fingerprints.
  */
case class WinnowF(child: Expression, w: Int, k: Int)
    extends UnaryExpression {
  require(w >= 1 && k >= 1, "winnow needs w >= 1 and k >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | org.apache.spark.sql.types.NullType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_winnow expects array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(a: Any): Any =
    WinnowF.compute(a.asInstanceOf[ArrayData], w, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WinnowF.compute($a, $w, $k);")

  override protected def withNewChildInternal(newChild: Expression): WinnowF =
    copy(child = newChild)
}

object WinnowF {
  val P = 2147483647L
  val B = 1000003L

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** `conv(substring(md5(s), 1, 12), 16, 10) % P` on the JVM: the
    * first 12 hex chars of an md5 are its first 6 bytes big-endian. */
  def tokenHash(s: UTF8String): Long = {
    val d = digest.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    v % P
  }

  def compute(arr: ArrayData, w: Int, k: Int): ArrayData = {
    val len = arr.numElements()
    if (len < w || k <= 0) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](len)
    val nulls = new Array[Boolean](len)
    var i = 0
    while (i < len) {
      if (arr.isNullAt(i)) nulls(i) = true
      else hs(i) = tokenHash(arr.getUTF8String(i))
      i += 1
    }
    // coefficients B^(w-1-j) mod P, identical to the driver literals
    // of the windowed form
    val coefs = new Array[Long](w)
    coefs(w - 1) = 1L
    var j = w - 2
    while (j >= 0) { coefs(j) = (coefs(j + 1) * B) % P; j -= 1 }
    // bounded selection: only the k smallest distinct hashes are ever
    // returned, so the set is capped at k entries (evict the largest
    // once full) — O(L log k) time, O(k) state per row, instead of
    // accumulating every distinct window hash of the document
    val seen = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i <= len - w) {
      var sum = 0L
      var ok = true
      var t = 0
      while (ok && t < w) {
        if (nulls(i + t)) ok = false
        else sum += (hs(i + t) * coefs(t)) % P
        t += 1
      }
      if (ok) {
        val h = java.lang.Long.valueOf(sum % P)
        if (seen.size() < k) seen.add(h)
        else if (h.longValue() < seen.last().longValue() && seen.add(h))
          seen.remove(seen.last())
      }
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    i = 0
    while (i < out.length) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }
}
