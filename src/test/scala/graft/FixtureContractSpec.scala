package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loud assertions on the fixture shapes the engine's literals depend
  * on. Fixture regeneration has already drifted physical encodings
  * once (round 5, `events.ts`); where the engine embeds data-shape
  * constants (LSH plane dim, CDC derivation columns), a silent drift
  * must become a NAMED test failure pointing at the contract, not a
  * hash mismatch deep in an oracle diff.
  */
class FixtureContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("embeddings.embedding is a 64-dim float array (LSH/PQ plane literals assume it)") {
    val emb = Tables.load(spark, dir, "embeddings")
    assert(emb.schema("embedding").dataType ==
      ArrayType(FloatType, containsNull = true) ||
      emb.schema("embedding").dataType ==
      ArrayType(FloatType, containsNull = false),
      s"embedding type drifted: ${emb.schema("embedding").dataType}")
    val dims = emb.select(size(col("embedding")).as("d"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(dims == Set(64),
      s"embedding dim drifted to $dims — Similarity.lshPlanes/PQ codebooks " +
        "and the VectorQueries oracle literals assume 64; regenerate both")
  }

  test("events carries the CDC-derivation columns with ts normalized to long nanos") {
    val ev = Tables.load(spark, dir, "events")
    val types = ev.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("ts") == LongType,
      s"ts not normalized to epoch-nanos long: ${types.get("ts")}")
    for (c <- Seq("event_id", "user_id")) assert(types(c) == LongType,
      s"$c drifted: ${types.get(c)}")
    assert(types("event_type") == StringType && types("props") == StringType)
    assert(types("value") == DoubleType, s"value drifted: ${types.get("value")}")
  }

  test("documents carries the text-pipeline columns") {
    val types = Tables.load(spark, dir, "documents")
      .schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("doc_id") == LongType && types("n_chars") == LongType)
    for (c <- Seq("text", "lang", "source")) assert(types(c) == StringType,
      s"$c drifted: ${types.get(c)}")
  }

  test("star-schema temporal columns read as a timestamp flavor") {
    for ((t, c) <- Seq("orders" -> "o_orderdate", "lineitem" -> "l_shipdate")) {
      val dt = Tables.load(spark, dir, t).schema(c).dataType
      assert(dt == TimestampType || dt == TimestampNTZType || dt == DateType,
        s"$t.$c drifted to $dt — date_trunc/year/month call sites assume a " +
          "temporal type")
    }
  }
}
