package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Glue-DynamicFrame-style schema-on-read operators.
  *
  * The reference reads every source through dynamic frames
  * (`create_dynamic_frame.from_catalog`, icberg/iceberg_tables.py:23,
  * delta/delta_tables.py:17), whose value at 100 TB is tolerance of
  * physical-schema drift across landing batches: renamed/retyped
  * columns (ApplyMapping), per-file type conflicts (ResolveChoice),
  * nested JSON (Unbox/Relationalize). Spark-first re-expression: each
  * op is a single narrow projection (codegen'd, zero shuffles) —
  * schema work happens at plan time on the driver, so these compose
  * freely with pushdown and pruning on any input size.
  */
object DynamicFrameOps {

  /** Glue-semantics cast: `try_cast`, so an uncastable drifted value
    * (a stray "n/a" in a numeric column) yields NULL for that cell —
    * Spark 4's default ANSI cast would kill the whole job, the
    * opposite of schema-on-read tolerance. */
  private def glueCast(c: org.apache.spark.sql.Column,
                       dt: DataType): org.apache.spark.sql.Column =
    c.try_cast(dt)

  /** ApplyMapping: `(source, target, targetType)` triples — rename +
    * cast + project in ONE projection (columns not listed are dropped,
    * like Glue's ApplyMapping). */
  def applyMapping(df: DataFrame,
                   mappings: Seq[(String, String, DataType)]): DataFrame =
    df.select(mappings.map { case (src, tgt, dt) =>
      glueCast(col(src), dt).as(tgt)
    }: _*)

  /** ResolveChoice with `cast:<type>` semantics: coerce the listed
    * columns in place; columns absent from the frame are ignored (a
    * batch that never saw the drift needs no resolution). Name match
    * is case-insensitive, like Spark's own resolution. */
  def resolveChoiceCast(df: DataFrame,
                        specs: Map[String, DataType]): DataFrame =
    specs.foldLeft(df) { case (d, (c, dt)) =>
      if (d.columns.exists(_.equalsIgnoreCase(c)))
        d.withColumn(c, glueCast(col(c), dt))
      else d
    }

  /** Union landing batches whose shared columns may disagree on
    * physical type (a shape parquet `mergeSchema` refuses): conform
    * every frame to the declared target schema — cast where present
    * (case-insensitive, matching Spark resolution), typed null where
    * missing — then union by name. The per-frame conform is a
    * projection, so each batch still scans with its own
    * pushdown/pruning. */
  def unionResolved(target: StructType, frames: Seq[DataFrame]): DataFrame = {
    require(frames.nonEmpty, "unionResolved needs at least one frame")
    frames.map { f =>
      val have = f.columns.map(_.toLowerCase).toSet
      f.select(target.fields.toIndexedSeq.map { fd =>
        if (have.contains(fd.name.toLowerCase))
          glueCast(col(fd.name), fd.dataType).as(fd.name)
        else lit(null).cast(fd.dataType).as(fd.name)
      }: _*)
    }.reduce(_.unionByName(_))
  }

  /** Auto resolveChoice policy — what to do with a column whose
    * observed type differs across landing batches, with NO declared
    * target schema (Glue resolveChoice's inferred mode,
    * icberg/iceberg_tables.py:55-58 reads through exactly this
    * surface). */
  sealed trait ChoicePolicy
  /** `cast`: coerce every conflicted column to the widest common type
    * observed (int widths widen, int+fractional → double, decimal
    * widens, any-vs-string → string, NTZ/date/ltz → timestamp). */
  case object CastWidest extends ChoicePolicy
  /** `make_cols`: split a conflicted column `c` observed as {bigint,
    * string} into sibling columns `c_bigint` / `c_string`; each batch
    * populates the one matching its physical type. */
  case object MakeCols extends ChoicePolicy
  /** `project:<type>`: keep only the values readable as `dt` (others
    * null), like Glue's project resolution. */
  final case class ProjectType(dt: DataType) extends ChoicePolicy

  /** Widest common type of two observed physical types — the `cast`
    * auto-resolution lattice. Mirrors Spark's own coercion direction
    * but never picks a lossy target (long+float → double, not float). */
  private[ops] def widest(a: DataType, b: DataType): DataType = {
    val intOrder = Seq[DataType](ByteType, ShortType, IntegerType, LongType)
    def isInt(t: DataType) = intOrder.contains(t)
    (a, b) match {
      case _ if a == b => a
      case (x: DecimalType, y: DecimalType) =>
        // union of integer-digit and fraction-digit budgets
        val scale = x.scale max y.scale
        val intDigits = (x.precision - x.scale) max (y.precision - y.scale)
        DecimalType((intDigits + scale) min DecimalType.MAX_PRECISION, scale)
      case (x, y) if isInt(x) && isInt(y) =>
        intOrder(intOrder.indexOf(x) max intOrder.indexOf(y))
      case (x, y) if (isInt(x) || x == FloatType || x == DoubleType ||
          x.isInstanceOf[DecimalType]) && (isInt(y) || y == FloatType ||
          y == DoubleType || y.isInstanceOf[DecimalType]) =>
        DoubleType // any int/float/decimal mix that isn't same-family
      case (x, y) if Seq(x, y).forall(t => t == TimestampType ||
          t == TimestampNTZType || t == DateType) => TimestampType
      case (ArrayType(ae, an), ArrayType(be, bn)) =>
        ArrayType(widest(ae, be), an || bn)
      case (x: StructType, y: StructType)
          if x.fields.map(_.name.toLowerCase).sorted.sameElements(
            y.fields.map(_.name.toLowerCase).sorted) =>
        // field-wise recursion (the canonical Glue landing drift: a
        // nested int widened to long must not stringify the struct).
        // Restricted to equal field-name sets: Spark's cast cannot add
        // or drop struct fields, so mismatched shapes fall through to
        // the string fallback rather than null out under try_cast.
        val yByName = y.fields.map(f => f.name.toLowerCase -> f).toMap
        StructType(x.fields.map { f =>
          val g = yByName(f.name.toLowerCase)
          f.copy(dataType = widest(f.dataType, g.dataType),
            nullable = f.nullable || g.nullable)
        })
      case _ => StringType // string-vs-anything, or no common shape
    }
  }

  private def typeSuffix(dt: DataType): String =
    dt.simpleString.replaceAll("[^A-Za-z0-9]+", "_").stripSuffix("_")

  /** Union landing batches whose schemas drifted, resolving every
    * type conflict by `policy` with NO declared target — Glue's
    * inferred resolveChoice. Column identity is case-insensitive
    * (first-seen spelling wins, matching Spark resolution); a column
    * absent from a batch is null there. Each per-batch conform is one
    * projection, so every batch keeps its own pushdown/pruning and
    * the union is shuffle-free. */
  def resolveChoiceAuto(frames: Seq[DataFrame],
                        policy: ChoicePolicy = CastWidest): DataFrame = {
    require(frames.nonEmpty, "resolveChoiceAuto needs at least one frame")
    // observed column order = first appearance across batches
    val names = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for (f <- frames; c <- f.schema.fieldNames)
      names.getOrElseUpdate(c.toLowerCase, c)
    // observed types per column, insertion-ordered for determinism
    val observed: Seq[(String, Seq[DataType])] = names.values.toSeq.map { n =>
      n -> frames.flatMap(_.schema.fields
            .find(_.name.equalsIgnoreCase(n)).map(_.dataType)).distinct
    }
    // output schema: (outputName, sourceName, targetType, onlyFromType)
    val outCols: Seq[(String, String, DataType, Option[DataType])] =
      observed.flatMap { case (n, types) =>
        if (types.size <= 1)
          Seq((n, n, types.headOption.getOrElse(StringType), None))
        else policy match {
          case CastWidest =>
            Seq((n, n, types.reduce(widest), None))
          case ProjectType(dt) =>
            Seq((n, n, dt, None))
          case MakeCols =>
            types.map(t => (s"${n}_${typeSuffix(t)}", n, t, Some(t)))
        }
      }
    frames.map { f =>
      val byLower = f.schema.fields.map(fd => fd.name.toLowerCase -> fd).toMap
      f.select(outCols.map { case (out, src, dt, onlyFrom) =>
        byLower.get(src.toLowerCase) match {
          case Some(fd) if onlyFrom.forall(_ == fd.dataType) =>
            glueCast(col(fd.name), dt).as(out)
          case _ => lit(null).cast(dt).as(out)
        }
      }: _*)
    }.reduce(_.unionByName(_))
  }

  /** Unbox: parse a JSON-string column into a typed struct in place
    * (Glue's Unbox with format=json). */
  def unbox(df: DataFrame, column: String, schema: DataType): DataFrame =
    df.withColumn(column, from_json(col(column), schema))

  /** Relationalize: flatten nested structs into dotted top-level
    * columns and split every (top-level, post-flatten) array column
    * into a child frame keyed by `idCols` with `(index, val)` — Glue's
    * relationalize, which turns one nested frame into a set of flat
    * relational tables. Returns `prefix -> root` plus
    * `prefix.<arrayCol> -> child` per array.
    *
    * Scale: flattening is a projection; each child is one
    * `posexplode` (narrow, no shuffle) — row count multiplies by
    * array cardinality exactly like the downstream join it replaces.
    */
  def relationalize(df: DataFrame, idCols: Seq[String],
                    prefix: String = "root"): Map[String, DataFrame] = {
    @annotation.tailrec
    def flatten(d: DataFrame): DataFrame = {
      if (!d.schema.fields.exists(_.dataType.isInstanceOf[StructType])) d
      else {
        // dotted names can collide with pre-existing top-level columns
        // (struct a{b} vs literal column "a.b"); uniquify with a
        // numeric suffix, case-insensitively (caseSensitive=false)
        val taken = scala.collection.mutable.Set[String]()
        d.schema.fields.foreach { f =>
          if (!f.dataType.isInstanceOf[StructType])
            taken += f.name.toLowerCase
        }
        def fresh(base: String): String = {
          var (nm, i) = (base, 1)
          while (taken.contains(nm.toLowerCase)) { nm = s"$base#$i"; i += 1 }
          taken += nm.toLowerCase
          nm
        }
        flatten(d.select(d.schema.fields.toIndexedSeq.flatMap { f =>
          f.dataType match {
            case st: StructType => st.fields.toIndexedSeq.map(sf =>
              col(s"`${f.name}`.`${sf.name}`")
                .as(fresh(s"${f.name}.${sf.name}")))
            case _ => Seq(col(s"`${f.name}`"))
          }
        }: _*))
      }
    }
    val flat = flatten(df)
    val arrayCols = flat.schema.fields
      .filter(_.dataType.isInstanceOf[ArrayType]).map(_.name)
    val root = flat.drop(arrayCols.toIndexedSeq: _*)
    val children = arrayCols.flatMap { name =>
      // in a recursive call idCols already carries the parent "index";
      // uniquify so nesting depth k yields index, index#1, ... index#k-1
      def avail(base: String): String = {
        val low = idCols.map(_.toLowerCase).toSet
        var (nm, i) = (base, 1)
        while (low.contains(nm.toLowerCase)) { nm = s"$base#$i"; i += 1 }
        nm
      }
      val (idxName, valName) = (avail("index"), avail("val"))
      val child = flat
        .select(idCols.map(c => col(s"`$c`")) :+
          posexplode(col(s"`$name`")): _*)
        .withColumnRenamed("pos", idxName)
        .withColumnRenamed("col", valName)
      // Glue recurses: a struct-typed or array-typed `val` is itself
      // relationalized (keyed by idCols + index), so arbitrarily
      // nested arrays-of-structs bottom out in flat tables
      val needsRecurse = child.schema.fields.exists(f =>
        f.dataType.isInstanceOf[StructType] ||
          (f.name == valName && f.dataType.isInstanceOf[ArrayType]))
      if (needsRecurse)
        relationalize(child, idCols :+ idxName, s"$prefix.$name")
      else Map(s"$prefix.$name" -> child)
    }.toMap
    Map(prefix -> root) ++ children
  }
}
