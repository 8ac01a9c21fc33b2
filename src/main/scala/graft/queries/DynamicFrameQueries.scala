package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.DynamicFrameOps
import Queries.{Entry, t}

/** Oracle-backed queries for the Glue-DynamicFrame schema-on-read
  * operators ([[graft.ops.DynamicFrameOps]]): ApplyMapping,
  * ResolveChoice across type-drifted landing batches, Unbox+flatten of
  * JSON, and Relationalize of array columns. These pin the capability
  * the round-5 fixture drift exposed as the engine's only real gap —
  * tolerating physical-schema variants of the same logical data
  * (icberg/iceberg_tables.py:23 dynamic frames, :103 implicit
  * coercion).
  */
object DynamicFrameQueries {

  private def tmpDir(prefix: String): String = Queries.scratchDir(prefix)

  /** ApplyMapping over events: rename + cast + project in one
    * projection. `ts` (engine contract: epoch-nanos long) maps through
    * unchanged; `user_id` narrows long→int — both sides cast
    * explicitly. */
  val applyMapping: Entry = Entry(
    "dynamic_apply_mapping",
    (s, dir) => DynamicFrameOps.applyMapping(t(s, dir, "events"), Seq(
        ("event_id", "id", LongType),
        ("user_id", "uid", IntegerType),
        ("event_type", "etype", StringType),
        ("ts", "ts_ns", LongType)))
      .orderBy("id"),
    Some("""SELECT event_id AS id, CAST(user_id AS INTEGER) AS uid,
        |  event_type AS etype, epoch_ns(ts) AS ts_ns
        |FROM events ORDER BY id""".stripMargin))

  /** ResolveChoice: two landing batches of the same logical table where
    * `value` drifted double→string in one batch (the classic crawler
    * choice type). parquet mergeSchema refuses this shape; the dynamic-
    * frame path conforms each batch to the declared target and unions.
    * Oracle replays the aggregate straight off `events` — identical
    * numbers prove the string batch round-tripped losslessly. */
  val resolveChoice: Entry = Entry(
    "dynamic_resolve_choice",
    (s, dir) => {
      val ev = t(s, dir, "events").select("event_id", "event_type", "value")
      val base = tmpDir("graft-choice")
      ev.where(col("event_id") % 2 === 0)
        .write.mode("overwrite").parquet(s"$base/a")
      ev.where(col("event_id") % 2 === 1)
        .withColumn("value", col("value").cast(StringType))
        .write.mode("overwrite").parquet(s"$base/b")
      val target = StructType(Seq(
        StructField("event_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType)))
      DynamicFrameOps.unionResolved(target,
          Seq(s.read.parquet(s"$base/a"), s.read.parquet(s"$base/b")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS n,
        |  round(sum(value), 2) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Auto resolveChoice — NO declared target (Glue's inferred mode,
    * icberg/iceberg_tables.py:55-58): three kinds of drift across two
    * landing batches of lineitem — int↔long width (l_linenumber),
    * int↔double (l_quantity), string↔double (l_discount) — plus a
    * column present in only one batch (l_tax). CastWidest infers
    * long / double / string / double-with-nulls respectively; the
    * aggregate matching a straight replay off `lineitem` proves every
    * inferred resolution round-tripped losslessly. */
  val resolveChoiceAuto: Entry = Entry(
    "dynamic_resolve_choice_auto",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
          "l_returnflag", "l_tax")
      val base = tmpDir("graft-choice-auto")
      li.where(col("l_orderkey") % 2 === 0)
        .withColumn("l_quantity", col("l_quantity").cast(IntegerType))
        .withColumn("l_discount", col("l_discount").cast(StringType))
        .drop("l_tax")
        .write.mode("overwrite").parquet(s"$base/a")
      li.where(col("l_orderkey") % 2 === 1)
        .withColumn("l_linenumber", col("l_linenumber").cast(LongType))
        .write.mode("overwrite").parquet(s"$base/b")
      val resolved = DynamicFrameOps.resolveChoiceAuto(
        Seq(s.read.parquet(s"$base/a"), s.read.parquet(s"$base/b")))
      resolved
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum("l_linenumber").as("sum_ln"),
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum(col("l_discount").cast(DoubleType)), 2).as("sum_disc"),
          round(sum("l_tax"), 2).as("sum_tax_odd"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(l_linenumber) AS BIGINT) AS sum_ln,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_discount), 2) AS sum_disc,
        |  round(sum(CASE WHEN l_orderkey % 2 = 1 THEN l_tax END), 2) AS sum_tax_odd
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** Unbox the JSON `props` string into a typed struct, relationalize,
    * and aggregate the flattened field — parse-once semantics (the
    * per-access `get_json_object` variant is json_props_extract). */
  val unboxFlatten: Entry = Entry(
    "dynamic_unbox_flatten",
    (s, dir) => {
      val un = DynamicFrameOps.unbox(
        t(s, dir, "events").select("event_id", "event_type", "props"),
        "props", StructType(Seq(StructField("k", LongType))))
      val root = DynamicFrameOps.relationalize(un, Seq("event_id"))("root")
      root.select(col("event_type"), col("`props.k`").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          countDistinct("k").as("distinct_k"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS distinct_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** Relationalize an array column: `embeddings.embedding` splits into
    * a child table (vec_id, index, val) via one posexplode — then a
    * per-index profile over the leading dimensions. */
  val relationalizeArrays: Entry = Entry(
    "dynamic_relationalize_arrays",
    (s, dir) => {
      val child = DynamicFrameOps.relationalize(
        t(s, dir, "embeddings").select("vec_id", "embedding"),
        Seq("vec_id"))("root.embedding")
      child.where(col("index") < 8)
        .select(col("index").cast(LongType).as("index"), col("val"))
        .groupBy("index")
        .agg(count(lit(1)).as("n"), round(avg("val"), 4).as("avg_v"))
        .orderBy("index")
    },
    Some("""SELECT CAST(i - 1 AS BIGINT) AS index, count(*) AS n,
        |  round(avg(v), 4) AS avg_v
        |FROM (SELECT vec_id, unnest(embedding) AS v,
        |             generate_subscripts(embedding, 1) AS i
        |      FROM embeddings)
        |WHERE i - 1 < 8 GROUP BY 1 ORDER BY 1""".stripMargin))

  val entries: Seq[Entry] =
    Seq(applyMapping, resolveChoice, resolveChoiceAuto, unboxFlatten,
      relationalizeArrays)
}
