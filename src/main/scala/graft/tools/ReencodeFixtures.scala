package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Write a deliberately schema-drifted copy of a fixture directory.
  *
  * Every drift applied here is LOSSLESS w.r.t. the canonical fixtures
  * (verified value properties: monetary doubles are exactly 2-decimal,
  * l_quantity is integral, l_shipdate is midnight-only), so a full
  * Verify run over the drifted copy must produce results identical to
  * one over the original — that is the acceptance check for the
  * `Tables.contract` scan-boundary normalizer (SURVEY §7.7 drift class;
  * round 5 lost 18 queries to exactly this).
  *
  * Drifts exercised: int32↔int64 key widths, double→decimal(12,2)
  * monetary, double→int integral quantities, timestamp→NTZ,
  * timestamp→DATE, timestamp→string wall clock, float32→float64
  * embedding elements.
  *
  * Usage: `runMain graft.tools.ReencodeFixtures <srcDir> <dstDir>`
  */
object ReencodeFixtures {

  /** table -> (column -> drift expression on the raw scan) */
  private def drifts: Map[String, Map[String, DataFrame => org.apache.spark.sql.Column]] = Map(
    "region" -> Map("r_regionkey" -> (_ => col("r_regionkey").cast(LongType))),
    "nation" -> Map(
      "n_nationkey" -> (_ => col("n_nationkey").cast(LongType)),
      "n_regionkey" -> (_ => col("n_regionkey").cast(LongType))),
    "customer" -> Map(
      "c_custkey" -> (_ => col("c_custkey").cast(IntegerType)),
      "c_nationkey" -> (_ => col("c_nationkey").cast(LongType)),
      "c_acctbal" -> (_ => col("c_acctbal").cast(DecimalType(12, 2)))),
    "supplier" -> Map(
      "s_suppkey" -> (_ => col("s_suppkey").cast(IntegerType)),
      "s_acctbal" -> (_ => col("s_acctbal").cast(DecimalType(12, 2)))),
    "part" -> Map(
      "p_size" -> (_ => col("p_size").cast(LongType)),
      "p_retailprice" -> (_ => col("p_retailprice").cast(DecimalType(12, 2)))),
    "orders" -> Map(
      "o_custkey" -> (_ => col("o_custkey").cast(IntegerType)),
      "o_totalprice" -> (_ => col("o_totalprice").cast(DecimalType(15, 2))),
      // LTZ micros -> naive wall clock; session tz is pinned to UTC below
      "o_orderdate" -> (_ => col("o_orderdate").cast(TimestampNTZType))),
    "lineitem" -> Map(
      "l_linenumber" -> (_ => col("l_linenumber").cast(LongType)),
      "l_quantity" -> (_ => col("l_quantity").cast(IntegerType)),
      "l_shipdate" -> (_ => col("l_shipdate").cast(DateType))),
    "events" -> Map(
      "user_id" -> (_ => col("user_id").cast(IntegerType)),
      // the hardest drift: epoch time as a STRING wall clock (§7.7.1)
      "ts" -> (_ => date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))),
    "documents" -> Map("n_chars" -> (_ => col("n_chars").cast(IntegerType))),
    "embeddings" -> Map(
      "vec_id" -> (_ => col("vec_id").cast(IntegerType)),
      "label" -> (_ => col("label").cast(LongType)),
      "embedding" -> (_ => col("embedding").cast(ArrayType(DoubleType)))))

  def reencode(spark: SparkSession, srcDir: String, dstDir: String): Unit = {
    for (t <- graft.Tables.all) {
      val raw = spark.read.parquet(s"$srcDir/$t.parquet")
      val d = drifts.getOrElse(t, Map.empty)
      val out = raw.select(raw.schema.fieldNames.toIndexedSeq.map { n =>
        d.get(n).map(f => f(raw).as(n)).getOrElse(col(n))
      }: _*)
      out.coalesce(1).write.mode("overwrite").parquet(s"$dstDir/$t.parquet")
      println(s"reencoded $t: " + out.schema.fields
        .filter(f => d.contains(f.name))
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", "))
    }
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.001")
    val dst = args.lift(1).getOrElse("/tmp/graft_drifted_sf0.001")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .appName("graft-reencode")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    reencode(spark, src, dst)
    spark.stop()
  }
}
