package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Schema-on-read tolerance for the event-time column (SURVEY §7.7;
  * round-5 regression class): the same logical `events.ts` has shipped
  * as parquet INT64 epoch-nanos (TIMESTAMP(NANOS) under the legacy
  * nanosAsLong flag reads identically), TIMESTAMP(MICROS) LTZ, and
  * TIMESTAMP(MICROS) NTZ. `Tables.load` must normalize all of them to
  * the engine contract — epoch-nanos LongType — so every event-time
  * query is encoding-independent. This pins that invariant so fixture
  * regeneration can never silently break the event family again.
  */
class FixtureEncodingSpec extends SparkSpec {

  // deterministic micro fixture: a few events across two hours
  private val rows = Seq(
    (1L, 10L, "click", 1.5, 1705400000000000L),   // epoch MICROS
    (2L, 10L, "view", 2.0, 1705400001500000L),
    (3L, 11L, "signup", 0.5, 1705403600000000L),
    (4L, 11L, "error", 3.0, 1705403700250000L),
    (5L, 12L, "click", 9.0, 1705407200999999L))

  private def writeVariants(): (String, String, String) = {
    import spark.implicits._
    val base = rows.toDF("event_id", "user_id", "event_type", "value", "us")

    val dLong = tmpDir("enc_long")
    base.withColumn("ts", col("us") * lit(1000L)).drop("us")
      .write.mode("overwrite").parquet(s"$dLong/events.parquet")

    val dLtz = tmpDir("enc_ltz")
    base.withColumn("ts", timestamp_micros(col("us")).cast(TimestampType))
      .drop("us").write.mode("overwrite").parquet(s"$dLtz/events.parquet")

    val dNtz = tmpDir("enc_ntz")
    base.withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      .drop("us").write.mode("overwrite").parquet(s"$dNtz/events.parquet")

    (dLong, dLtz, dNtz)
  }

  test("Tables.load normalizes long/LTZ/NTZ ts encodings to identical epoch-nanos") {
    val (dLong, dLtz, dNtz) = writeVariants()
    val expected = rows.map { case (id, _, _, _, us) => (id, us * 1000L) }.toMap
    for ((dir, label) <- Seq(dLong -> "int64-nanos", dLtz -> "micros-ltz",
                             dNtz -> "micros-ntz")) {
      val df = Tables.load(spark, dir, "events")
      assert(df.schema("ts").dataType ==
        org.apache.spark.sql.types.LongType, s"$label: ts not LongType")
      val got = df.select("event_id", "ts").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"$label: normalized nanos differ")
    }
  }

  test("an event-time query (hourly agg shape) is identical across encodings") {
    val (dLong, dLtz, dNtz) = writeVariants()
    def hourly(dir: String): Seq[(java.sql.Timestamp, Long)] =
      Tables.load(spark, dir, "events")
        .select(date_trunc("hour", Tables.nsToTimestamp("ts")).as("hour"))
        .groupBy("hour").agg(count(lit(1)).as("n"))
        .orderBy("hour")
        .collect().toIndexedSeq.map(r => (r.getTimestamp(0), r.getLong(1)))
    val a = hourly(dLong)
    assert(a == hourly(dLtz), "LTZ encoding diverges from int64-nanos")
    assert(a == hourly(dNtz), "NTZ encoding diverges from int64-nanos")
    assert(a.map(_._2).sum == rows.size)
  }

  test("Cdc.derive accepts a timestamp-typed ts frame (guarded normalization)") {
    import spark.implicits._
    val tsFrame = rows.toDF("event_id", "user_id", "event_type", "value", "us")
      .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      .drop("us")
    val derived = graft.ops.Cdc.derive(tsFrame, k = 3)
    val byId = derived.select("event_id", "op", "partition_0")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(byId(3L)._1 == "I" && byId(4L)._1 == "D")
    assert(byId.values.forall(_._2 == "2024"))
  }
}
