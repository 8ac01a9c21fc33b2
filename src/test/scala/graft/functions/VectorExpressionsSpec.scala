package graft.functions

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("native dot product equals the HOF formulation bit-for-bit") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val both = emb.limit(200)
      .select(Similarity.dot(col("embedding"), col("embedding")).as("fast"),
        Similarity.dotHof(col("embedding"), col("embedding")).as("hof"))
    assert(both.where(col("fast") =!= col("hof")).count() == 0)
  }

  test("native dot is null-safe and usable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").as[Double].head()
    assert(r == 11.0)
    val n = spark.sql("SELECT graft_dot(NULL, array(CAST(1.0 AS FLOAT))) AS d")
      .collect().head
    assert(n.isNullAt(0))
  }

  test("mixed float/double arrays dot correctly in both eval modes") {
    GraftFunctions.register(spark)
    // interpreted eval (constant folding) and codegen'd eval over a
    // frame must both widen per side: float x double, double x double
    val r = spark.sql(
      "SELECT graft_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(2.0 AS DOUBLE), CAST(0.5 AS DOUBLE))) AS d")
      .as[Double].head()
    assert(r == 4.0)
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(100)
      .select(col("embedding"),
        col("embedding").cast("array<double>").as("demb"))
    val mixed = emb.select(
      Similarity.dot(col("embedding"), col("demb")).as("fd"),
      Similarity.dot(col("demb"), col("demb")).as("dd"),
      Similarity.dot(col("embedding"), col("embedding")).as("ff"))
    // float->double cast is exact, so all three agree bit-for-bit
    assert(mixed.where(col("fd") =!= col("dd") || col("fd") =!= col("ff"))
      .count() == 0)
  }

  test("GraftExtensions injects graft_dot at session build") {
    import org.apache.spark.sql.SparkSession
    val orig = spark // force SparkSpec session to exist
    // getOrCreate returns the existing session (extensions silently
    // ignored) unless active+default are cleared first — clear them so
    // a genuinely new session is built with the extensions applied
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne orig, "builder returned the shared session; test would be vacuous")
      val r = s2.sql(
        "SELECT graft_dot(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))) AS d")
        .collect().head.getDouble(0)
      assert(r == 6.0)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("optimizer rule rewrites the HOF dot idiom to the native expression") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteHofDotProduct
    try {
      val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
        .limit(100)
      val hof = emb.select(col("vec_id"),
        Similarity.dotHof(col("embedding"), col("embedding")).as("d"))
      assert(hof.queryExecution.optimizedPlan.toString.contains("graft_dot"),
        "HOF dot idiom not rewritten:\n" +
          hof.queryExecution.optimizedPlan.toString)
      // results unchanged vs the unrewritten native form
      val native = emb.select(col("vec_id"),
        Similarity.dot(col("embedding"), col("embedding")).as("d"))
      assert(hof.exceptAll(native).isEmpty && native.exceptAll(hof).isEmpty)
      // a superficially similar aggregate (sum of pairwise MAX) is NOT a
      // dot product and must stay untouched
      val notDot = emb.select(aggregate(
        zip_with(col("embedding"), col("embedding"),
          (x, y) => greatest(x.cast("double"), y.cast("double"))),
        lit(0.0), (acc, v) => acc + v).as("m"))
      assert(!notDot.queryExecution.optimizedPlan.toString.contains("graft_dot"))
      // null semantics survive the rewrite: mismatched lengths -> NULL.
      // NON-literal inputs: with the extension-injected rule always on,
      // a literal-array probe folds to a null literal before the plan
      // assertion could see graft_dot (constant folding runs after the
      // in-pipeline rewrite — itself proof the rewrite evaluates)
      // built over Range (not a LocalRelation), or
      // ConvertToLocalRelation evaluates the whole projection away
      val mismDf = spark.range(1).select(
        array((col("id") + 1).cast("float")).as("a"),
        array((col("id") + 1).cast("float"),
          (col("id") + 2).cast("float")).as("b"))
      val mism = mismDf.select(aggregate(
        zip_with(col("a"), col("b"),
          (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("d"))
      assert(mism.queryExecution.optimizedPlan.toString.contains("graft_dot"))
      assert(mism.collect().head.isNullAt(0))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RewriteHofDotProduct)
    }
  }

  test("two dot products in one projection codegen together") {
    // regression: fixed local names (n/acc/i) redefined when two
    // graft_dot calls landed in the same codegen scope — the generated
    // class failed to compile and the WHOLE projection silently fell
    // back to interpreted mode. GenerateUnsafeProjection has no
    // fallback path, so a redefinition fails this test loudly.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val arr = ArrayType(FloatType)
    val a = BoundReference(0, arr, nullable = true)
    val b = BoundReference(1, arr, nullable = true)
    val proj = GenerateUnsafeProjection.generate(
      Seq(DotProductF(a, a), DotProductF(a, b), DotProductF(b, b)))
    val row = InternalRow(
      ArrayData.toArrayData(Array(1.0f, 2.0f)),
      ArrayData.toArrayData(Array(3.0f, 4.0f)))
    val out = proj(row)
    assert(out.getDouble(0) == 5.0 && out.getDouble(1) == 11.0 &&
      out.getDouble(2) == 25.0)
  }

  test("dot product participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val df = emb.select(Similarity.dot(col("embedding"), col("embedding")).as("d"))
      .where(col("d") > 0)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1)") || p.contains("WholeStageCodegen"),
      s"expression fell out of codegen:\n$p")
  }
}
