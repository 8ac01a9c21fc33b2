package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding hot path: dot product
  * of two float or double arrays (sides may mix — e.g. float probes
  * against a dequantized double corpus) with left-to-right double
  * accumulation — numerically identical to the HOF
  * `aggregate(zip_with(a, b, (x, y) -> x*y), 0d, +)` it replaces
  * (so DuckDB-oracle values are unchanged), but with a tight
  * codegen'd loop over ArrayData instead of interpreted lambda calls
  * and per-element array allocation. At 100 TB the dot product runs
  * billions of times; this is the operator worth dropping to custom
  * codegen for (SURVEY §7.4).
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case org.apache.spark.sql.types.NullType => true // null in -> null out
    case _ => false
  }
  private def isDoubleArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(elemOk)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two array<float>/array<double> args, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = DoubleType
  // can produce NULL even for non-null inputs (length mismatch / null element)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  // NULL semantics match the HOF formulation exactly: zip_with pads a
  // length mismatch with nulls and null*x = null, and aggregate's sum
  // with any null term is null — so mismatched lengths or any null
  // element yield NULL here too (oracle-parity invariant).
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lx = isDoubleArr(left)
    val ly = isDoubleArr(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lx) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (ly) y.getDouble(i) else y.getFloat(i).toDouble
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh locals: two graft_dot calls can land in one codegen
      // scope (e.g. dot + norm in a cosine projection); fixed names
      // would redefine and kick the projection to interpreted mode
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      def get(arr: String, e: Expression) =
        if (isDoubleArr(e)) s"$arr.getDouble($i)" else s"(double) $arr.getFloat($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${get(a, left)} * ${get(b, right)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-level API for the graft native functions. */
object GraftFunctions {
  @volatile private var registered = Set.empty[Int]

  /** Idempotently register graft SQL functions on a session (makes
    * them available to both `call_function` and `spark.sql`). */
  def register(spark: SparkSession): Unit = {
    val key = System.identityHashCode(spark.sessionState)
    if (!registered.contains(key)) synchronized {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_dot", exprs => DotProductF(exprs(0), exprs(1)), "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_max_mult", exprs => MaxMultiplicityF(exprs(0)), "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_ndistinct", exprs => ArrayNDistinctF(exprs(0)), "scala_udf")
      registered += key
    }
  }

  /** Codegen'd float-array dot product (requires `register`). */
  def dotF(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Codegen'd max element multiplicity of array<string> (requires
    * `register`). */
  def maxMultF(arr: Column): Column = call_function("graft_max_mult", arr)

  /** Codegen'd distinct-element count of array<string> (requires
    * `register`). */
  def nDistinctF(arr: Column): Column = call_function("graft_ndistinct", arr)
}
