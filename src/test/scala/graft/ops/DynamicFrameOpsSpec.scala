package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class DynamicFrameOpsSpec extends SparkSpec {
  import spark.implicits._

  test("applyMapping renames, casts and projects in one pass") {
    val df = Seq((1L, "7", 2.5), (2L, "8", 3.5)).toDF("a", "b", "c")
    val out = DynamicFrameOps.applyMapping(df, Seq(
      ("a", "id", IntegerType), ("b", "num", LongType)))
    assert(out.columns.toSeq == Seq("id", "num"))
    assert(out.schema("id").dataType == IntegerType)
    assert(out.schema("num").dataType == LongType)
    assert(out.orderBy("id").collect().map(r => (r.getInt(0), r.getLong(1)))
      .toSeq == Seq((1, 7L), (2, 8L)))
  }

  test("resolveChoiceCast coerces listed columns, ignores absent ones") {
    val df = Seq(("1", 2.0)).toDF("x", "y")
    val out = DynamicFrameOps.resolveChoiceCast(df,
      Map("x" -> LongType, "nope" -> StringType))
    assert(out.schema("x").dataType == LongType)
    assert(out.schema("y").dataType == DoubleType)
  }

  test("unionResolved conforms type-drifted batches and null-fills missing columns") {
    val a = Seq((1L, "1.5")).toDF("id", "v") // v drifted to string
    val b = Seq((2L, 2.5, "x")).toDF("id", "v", "extra")
    val target = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType),
      StructField("tag", StringType)))
    val out = DynamicFrameOps.unionResolved(target, Seq(a, b))
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq(("id", LongType), ("v", DoubleType), ("tag", StringType)))
    val rows = out.orderBy("id").collect()
    assert(rows.map(_.getDouble(1)).toSeq == Seq(1.5, 2.5))
    assert(rows.forall(_.isNullAt(2)))
  }

  test("casts are Glue-tolerant: an uncastable drifted value nulls the cell, not the job") {
    val df = Seq(("1.5"), ("n/a")).toDF("v")
    val out = DynamicFrameOps.resolveChoiceCast(df, Map("v" -> DoubleType))
      .orderBy(desc("v")).collect()
    assert(out(0).getDouble(0) == 1.5 && out(1).isNullAt(0))
    val mapped = DynamicFrameOps.applyMapping(df, Seq(("v", "d", DoubleType)))
      .orderBy(desc("d")).collect()
    assert(mapped(0).getDouble(0) == 1.5 && mapped(1).isNullAt(0))
  }

  test("unionResolved and resolveChoiceCast match columns case-insensitively") {
    val drifted = Seq((1L, "2.5")).toDF("id", "VALUE")
    val target = StructType(Seq(
      StructField("id", LongType), StructField("value", DoubleType)))
    val u = DynamicFrameOps.unionResolved(target, Seq(drifted)).collect()
    assert(u(0).getDouble(1) == 2.5, "case-drifted column was null-filled")
    val r = DynamicFrameOps.resolveChoiceCast(drifted, Map("value" -> DoubleType))
    assert(r.schema.fields.exists(f =>
      f.name.equalsIgnoreCase("value") && f.dataType == DoubleType))
  }

  test("widest common type lattice: widths widen, mixes go double, string absorbs") {
    import DynamicFrameOps.widest
    assert(widest(IntegerType, LongType) == LongType)
    assert(widest(IntegerType, DoubleType) == DoubleType)
    assert(widest(LongType, FloatType) == DoubleType) // never lossy float
    assert(widest(DecimalType(10, 2), DecimalType(8, 4)) == DecimalType(12, 4))
    assert(widest(DecimalType(10, 2), LongType) == DoubleType)
    assert(widest(StringType, DoubleType) == StringType)
    assert(widest(TimestampNTZType, TimestampType) == TimestampType)
    assert(widest(DateType, TimestampType) == TimestampType)
    assert(widest(ArrayType(FloatType), ArrayType(DoubleType)) ==
      ArrayType(DoubleType))
    assert(widest(BooleanType, LongType) == StringType) // no common shape
    // struct recursion: same field names widen field-wise (nested int
    // drift must not stringify the struct); shape mismatch falls back
    val sa = StructType(Seq(StructField("a", IntegerType)))
    val sb = StructType(Seq(StructField("A", LongType)))
    assert(widest(sa, sb) == StructType(Seq(StructField("a", LongType))))
    val sc = StructType(Seq(StructField("b", LongType)))
    assert(widest(sa, sc) == StringType)
  }

  test("resolveChoiceAuto widens nested struct fields instead of stringifying") {
    val a = Seq((1L, (7, "x"))).toDF("id", "s")
    val b = Seq((2L, (9L, "y"))).toDF("id", "s")
    val out = DynamicFrameOps.resolveChoiceAuto(Seq(a, b))
    assert(out.schema("s").dataType.isInstanceOf[StructType])
    val rows = out.orderBy("id").select("s._1", "s._2").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((7L, "x"), (9L, "y")))
  }

  test("resolveChoiceAuto cast policy infers the widest type per conflicted column") {
    val a = Seq((1, "x", 10)).toDF("id", "tag", "q")   // id int, q int
    val b = Seq((2L, "y", 2.5)).toDF("id", "tag", "q") // id long, q double
    val out = DynamicFrameOps.resolveChoiceAuto(Seq(a, b))
    assert(out.schema.fields.map(f => f.name -> f.dataType).toSeq ==
      Seq("id" -> LongType, "tag" -> StringType, "q" -> DoubleType))
    assert(out.orderBy("id").collect().map(_.getDouble(2)).toSeq ==
      Seq(10.0, 2.5))
  }

  test("resolveChoiceAuto make_cols splits a conflicted column into typed siblings") {
    val a = Seq((1L, "7")).toDF("id", "v")
    val b = Seq((2L, 8L)).toDF("id", "v")
    val out = DynamicFrameOps.resolveChoiceAuto(Seq(a, b),
      DynamicFrameOps.MakeCols)
    assert(out.columns.toSeq == Seq("id", "v_string", "v_bigint"))
    val rows = out.orderBy("id").collect()
    assert(rows(0).getString(1) == "7" && rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).getLong(2) == 8L)
  }

  test("resolveChoiceAuto project policy keeps one type, nulls the rest") {
    val a = Seq((1L, "1.5"), (2L, "n/a")).toDF("id", "v")
    val b = Seq((3L, 2.5)).toDF("id", "v")
    val out = DynamicFrameOps.resolveChoiceAuto(Seq(a, b),
      DynamicFrameOps.ProjectType(DoubleType))
    assert(out.schema("v").dataType == DoubleType)
    val byId = out.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(byId == Map(1L -> Some(1.5), 2L -> None, 3L -> Some(2.5)))
  }

  test("resolveChoiceAuto null-fills a column absent from one batch, case-insensitively") {
    val a = Seq((1L, 0.1)).toDF("id", "TAX")
    val b = Seq((2L, "z")).toDF("id", "name")
    val out = DynamicFrameOps.resolveChoiceAuto(Seq(a, b))
    assert(out.columns.toSeq == Seq("id", "TAX", "name"))
    val rows = out.orderBy("id").collect()
    assert(rows(0).getDouble(1) == 0.1 && rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).getString(2) == "z")
  }

  test("unbox parses JSON strings into a typed struct (bad rows -> null)") {
    val df = Seq((1L, """{"k": 5}"""), (2L, "not json")).toDF("id", "props")
    val out = DynamicFrameOps.unbox(df, "props",
      StructType(Seq(StructField("k", LongType))))
    val rows = out.orderBy("id").select(col("props.k")).collect()
    assert(rows(0).getLong(0) == 5L && rows(1).isNullAt(0))
  }

  test("relationalize flattens nested structs and splits arrays into child frames") {
    val df = Seq((1L, (10L, "a"), Seq(1.0f, 2.0f)),
                 (2L, (20L, "b"), Seq(3.0f)))
      .toDF("id", "meta", "vec")
    val rel = DynamicFrameOps.relationalize(df, Seq("id"))
    assert(rel.keySet == Set("root", "root.vec"))
    val root = rel("root")
    assert(root.columns.toSeq == Seq("id", "meta._1", "meta._2"))
    val child = rel("root.vec").orderBy("id", "index").collect()
    assert(child.map(r => (r.getLong(0), r.getInt(1), r.getFloat(2))).toSeq ==
      Seq((1L, 0, 1.0f), (1L, 1, 2.0f), (2L, 0, 3.0f)))
  }

  test("relationalize flattens multi-level structs to dotted names") {
    val df = spark.sql(
      "SELECT 1L AS id, named_struct('inner', named_struct('x', 42L)) AS s")
    val root = DynamicFrameOps.relationalize(df, Seq("id"))("root")
    assert(root.columns.toSeq == Seq("id", "s.inner.x"))
    assert(root.select(col("`s.inner.x`")).head.getLong(0) == 42L)
  }

  test("relationalize uniquifies a dotted name colliding with a literal column") {
    // literal column "a.b" pre-exists; struct a{b} must not shadow it
    val df = spark.sql(
      "SELECT 1L AS id, 7L AS `a.b`, named_struct('b', 42L) AS a")
    val root = DynamicFrameOps.relationalize(df, Seq("id"))("root")
    assert(root.columns.length == root.columns.map(_.toLowerCase).distinct.length,
      s"duplicate columns: ${root.columns.toSeq}")
    val r = root.select(col("`a.b`"), col("`a.b#1`")).head
    assert(r.getLong(0) == 7L && r.getLong(1) == 42L)
  }

  test("relationalize recurses into arrays of structs (Glue fidelity)") {
    val df = spark.sql(
      """SELECT 1L AS id,
           array(named_struct('k', 'x', 'vs', array(10L, 11L)),
                 named_struct('k', 'y', 'vs', array(20L))) AS items""")
    val rel = DynamicFrameOps.relationalize(df, Seq("id"))
    assert(rel.keySet == Set("root", "root.items", "root.items.val.vs"))
    val items = rel("root.items").orderBy("index")
    assert(items.columns.toSeq == Seq("id", "index", "val.k"))
    assert(items.select(col("`val.k`")).collect().map(_.getString(0)).toSeq
      == Seq("x", "y"))
    val leaf = rel("root.items.val.vs").orderBy(col("index"), col("index#1"))
    val vs = leaf.select("val").collect().map(_.getLong(0)).toSeq
    assert(vs == Seq(10L, 11L, 20L))
  }
}
