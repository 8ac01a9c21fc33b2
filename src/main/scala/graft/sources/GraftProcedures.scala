package graft.sources

import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, IntegerType, LongType, StringType, StructType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

import graft.lake.{GraftSql, MaterializedView, TableStore}

/** Stored maintenance procedures for [[GraftCatalog]] — Spark 4's
  * `ProcedureCatalog` surface, the idiom Iceberg established for
  * table maintenance in plain SQL (`CALL cat.system.rewrite_data_files`,
  * `expire_snapshots`, `rollback_to_snapshot`; the reference's Glue
  * jobs run exactly such Iceberg catalogs —
  * icberg/iceberg_tables.py:13-20 wires `spark.sql.catalog.AwsDataCatalog`):
  *
  * {{{
  *   CALL gq.system.optimize(table => 't', zorder_by => 'a,b')
  *   CALL gq.system.vacuum(table => 't', retain_versions => 3)
  *   CALL gq.system.export_snapshot(table => 't', location => '/x')
  *   CALL gq.system.refresh_mv(view => 'm')
  *   CALL gq.system.restore(table => 't', version => 2)
  * }}}
  *
  * Each procedure binds onto the SAME machinery as the GraftSql verb
  * it mirrors (OPTIMIZE / VACUUM / EXPORT TABLE / REFRESH MATERIALIZED
  * VIEW / RESTORE TABLE) — one implementation, two spellings — and
  * returns its bounded summary rows through a [[LocalScan]] (the
  * result frames are O(1) or O(#versions) metadata, never data).
  * Spark's analyzer handles resolution, named/positional args,
  * defaults, and type coercion (`ResolveProcedures` →
  * `BindProcedures` → `InvokeProcedures`); `SHOW PROCEDURES` and
  * `DESCRIBE PROCEDURE` work out of the box.
  *
  * Scale: identical to the front-door verbs — OPTIMIZE is O(small
  * files + delete debt), VACUUM and RESTORE are manifest metadata,
  * EXPORT streams one distributed write. The procedure layer itself
  * collects only the summary frame.
  */
object GraftProcedures {

  /** Procedures live under the `system` namespace, Iceberg-style. */
  val Namespace: Array[String] = Array("system")

  // constructed front-door text must not smuggle syntax: table/view
  // names stay strict identifiers, paths refuse the quote the verb
  // grammar cannot escape
  private val IdentRe = "[A-Za-z_]\\w*".r
  private def requireIdent(kind: String, v: String): String = {
    require(v != null && IdentRe.matches(v), s"$kind must be a plain " +
      s"identifier ([A-Za-z_]\\w*), got ${Option(v).getOrElse("NULL")}")
    v
  }
  private def requirePath(v: String): String = {
    require(v != null && v.nonEmpty, "location is required")
    require(!v.contains("'"), s"location must not contain ': $v")
    v
  }

  private def param(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def optParam(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue("NULL").build()

  private def str(in: InternalRow, i: Int): Option[String] =
    if (in.isNullAt(i)) None else Some(in.getUTF8String(i).toString)
  private def long(in: InternalRow, i: Int): Option[Long] =
    if (in.isNullAt(i)) None else Some(in.getLong(i))

  /** Collected summary Rows → InternalRows for the LocalScan. Only
    * the types the maintenance summaries actually carry. */
  private def toInternal(schema: StructType,
                         rows: Seq[org.apache.spark.sql.Row]): Array[InternalRow] =
    rows.map { r =>
      val vals = new Array[Any](schema.length)
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        vals(i) =
          if (r.isNullAt(i)) null
          else f.dataType match {
            case StringType => UTF8String.fromString(r.getString(i))
            case IntegerType => r.getInt(i)
            case LongType => r.getLong(i)
            case BooleanType => r.getBoolean(i)
            case DoubleType => r.getDouble(i)
            case TimestampType =>
              r.getTimestamp(i).getTime * 1000L +
                (r.getTimestamp(i).getNanos / 1000L) % 1000L
            case org.apache.spark.sql.types.ArrayType(StringType, _) =>
              new org.apache.spark.sql.catalyst.util.GenericArrayData(
                r.getSeq[String](i).map(s =>
                  if (s == null) null else UTF8String.fromString(s)).toArray)
            case dt => throw new IllegalArgumentException(
              s"unsupported procedure result type $dt for ${f.name}")
          }
      }
      new GenericInternalRow(vals): InternalRow
    }.toArray

  /** One UnboundProcedure: `run` returns the summary (schema, rows). */
  private final class Proc(
      procName: String, desc: String,
      params: Array[ProcedureParameter],
      run: (SparkSession, TableStore, InternalRow) => (StructType, Array[InternalRow]),
      storeOf: () => TableStore)
    extends UnboundProcedure {
    override def name(): String = procName
    override def description(): String = desc
    override def bind(inputType: StructType): BoundProcedure =
      new BoundProcedure {
        override def name(): String = procName
        override def description(): String = desc
        override def parameters(): Array[ProcedureParameter] = params
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val (resultSchema, resultRows) = run(SparkSession.active, storeOf(), input)
          Collections.singletonList[Scan](new LocalScan {
            override def rows(): Array[InternalRow] = resultRows
            override def readSchema(): StructType = resultSchema
          }).iterator()
        }
      }
  }

  /** Delegate to the GraftSql verb and collect its bounded summary. */
  private def viaFrontDoor(spark: SparkSession, store: TableStore,
                           sql: String): (StructType, Array[InternalRow]) = {
    val df = GraftSql.execute(spark, store, sql)
    (df.schema, toInternal(df.schema, df.collect().toSeq))
  }

  private def summary(cols: (String, DataType)*)(vals: Any*)
      : (StructType, Array[InternalRow]) = {
    val schema = StructType(cols.map { case (n, dt) =>
      org.apache.spark.sql.types.StructField(n, dt, nullable = true) })
    val conv = vals.map {
      case s: String => UTF8String.fromString(s)
      case other => other
    }
    (schema, Array[InternalRow](new GenericInternalRow(conv.toArray)))
  }

  def all(storeOf: () => TableStore): Map[String, UnboundProcedure] = Map(
    "optimize" -> new Proc("optimize",
      "Compact small files and fold merge-on-read delete debt; with " +
        "zorder_by, rewrite into z-ordered ranges (OPTIMIZE verb).",
      Array(param("table", StringType), optParam("zorder_by", StringType)),
      (spark, store, in) => {
        val t = requireIdent("table", str(in, 0).orNull)
        val z = str(in, 1).map(_.trim).filter(_.nonEmpty)
        z.foreach(_.split(",").map(_.trim).foreach(requireIdent("zorder_by column", _)))
        viaFrontDoor(spark, store,
          z.fold(s"OPTIMIZE $t")(c => s"OPTIMIZE $t ZORDER BY ($c)"))
      }, storeOf),

    "vacuum" -> new Proc("vacuum",
      "Expire snapshots: retain_hours keeps versions younger than the " +
        "horizon, retain_versions keeps the newest n, neither keeps " +
        "only the current version (VACUUM verb).",
      Array(param("table", StringType), optParam("retain_hours", LongType),
        optParam("retain_versions", LongType)),
      (spark, store, in) => {
        val t = requireIdent("table", str(in, 0).orNull)
        val hours = long(in, 1)
        val versions = long(in, 2)
        require(hours.isEmpty || versions.isEmpty,
          "pass retain_hours OR retain_versions, not both")
        val retain = hours.map(h => s" RETAIN $h HOURS")
          .orElse(versions.map(v => s" RETAIN $v VERSIONS")).getOrElse("")
        viaFrontDoor(spark, store, s"VACUUM $t$retain")
      }, storeOf),

    "export_snapshot" -> new Proc("export_snapshot",
      "Write the manifest-resolved state (deletes applied, logical " +
        "names restored, version pinned) as flat parquet any engine " +
        "can read; an MV exports its consolidated rows (EXPORT TABLE verb).",
      Array(param("table", StringType), param("location", StringType),
        optParam("version", LongType)),
      (spark, store, in) => {
        val t = requireIdent("table", str(in, 0).orNull)
        val dest = requirePath(str(in, 1).orNull)
        val ver = long(in, 2).map(v => s" VERSION AS OF $v").getOrElse("")
        viaFrontDoor(spark, store, s"EXPORT TABLE $t TO '$dest'$ver")
      }, storeOf),

    "refresh_mv" -> new Proc("refresh_mv",
      "Incrementally fold a materialized view's pending source deltas " +
        "(REFRESH MATERIALIZED VIEW verb); O(changed data), returns " +
        "the refreshed view version.",
      Array(param("view", StringType)),
      (spark, store, in) => {
        val mv = requireIdent("view", str(in, 0).orNull)
        val v = MaterializedView.refresh(store, mv)
        summary("view_name" -> StringType, "version" -> LongType)(mv, v)
      }, storeOf),

    "history" -> new Proc("history",
      "Per-version commit log: operation, files, delete entries, " +
        "bytes, rows, commit time — manifest metadata, no data scan " +
        "(DESCRIBE HISTORY verb).",
      Array(param("table", StringType)),
      (spark, store, in) => {
        val t = requireIdent("table", str(in, 0).orNull)
        viaFrontDoor(spark, store, s"DESCRIBE HISTORY $t")
      }, storeOf),

    "detail" -> new Proc("detail",
      "One row of current-state metadata: location, version, file/" +
        "byte/row tallies, partitioning, constraints, column mapping " +
        "(DESCRIBE DETAIL verb).",
      Array(param("table", StringType)),
      (spark, store, in) => {
        val t = requireIdent("table", str(in, 0).orNull)
        viaFrontDoor(spark, store, s"DESCRIBE DETAIL $t")
      }, storeOf),

    "restore" -> new Proc("restore",
      "O(1) rollback: a NEW commit whose manifest copies the named " +
        "version's (RESTORE TABLE verb); history is preserved, VACUUM " +
        "trims it.",
      Array(param("table", StringType), param("version", LongType)),
      (spark, store, in) => {
        val t = requireIdent("table", str(in, 0).orNull)
        val v = long(in, 1).getOrElse(
          throw new IllegalArgumentException("version is required"))
        require(store.exists(t), s"unknown graft table $t")
        store.restore(t, v)
        summary("table_name" -> StringType, "restored_to" -> LongType,
          "current_version" -> LongType)(t, v, store.currentVersion(t).get)
      }, storeOf)
  )
}
