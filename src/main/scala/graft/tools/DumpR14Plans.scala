package graft.tools

import org.apache.spark.sql.SparkSession
import graft.queries.Queries
import java.nio.file.{Files, Paths}

/** Round-14 optimization evidence: formatted physical plans of the
  * queries the optimization pass touched, written to
  * `plans/r14/<query>_<suffix>.txt`. Run with suffix `before` on the
  * pre-round tree and `after` on the final tree:
  * `sbt "runMain graft.tools.DumpR14Plans before|after [sfDir]"`.
  *
  * Besides the registry queries, dumps the IVF-PQ CODES BUILD
  * intermediate (the frame `buildIvfPqIndex` writes): its plan is
  * where the round's join-elimination shows — the old pipeline
  * re-attached (cent_id, attrs) to the encoded rows with an id-join;
  * the new one carries them through the encode argmax. Both shapes
  * are expressible with the current API, so the `before` variant is
  * reconstructed explicitly here when the new carry API exists.
  */
object DumpR14Plans {
  private val touched = Seq(
    // ANN family — index builds share one corpus checkpoint; IVF-PQ
    // codes build lost its id-join; searches read schema-cached scans
    "ivf_ann_topk", "ivf_ann_persisted", "ivf_ann_incremental",
    "ivf_ann_after_delete", "ivf_ann_filtered", "ivf_ann_synced",
    "ivf_ann_streaming_ingest", "pq_ann_topk",
    "ivfpq_ann_persisted", "ivfpq_ann_after_delete",
    "ivfpq_ann_filtered", "ivfpq_ann_synced",
    // MV family — refresh delete-probe now manifest-metadata
    "mv_incremental_refresh", "mv_query_rewrite", "mv_join_minmax",
    "mv_approx_distinct", "mv_expr_group_rollup",
    // store lifecycle families — schema-cached scans, NIO metadata ops
    "dsv2_read_path", "dsv2_call_procedures", "cdc_pipeline_e2e",
    "cdc_pipeline_e2e_mor", "sql_lifecycle_e2e", "sql_transaction_e2e",
    "export_snapshot_parity", "partition_evolution_e2e",
    // plain scans whose fixture loads are schema-cached
    "q5_regional_revenue", "q8_market_share", "hybrid_retrieval_rrf")

  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("after")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r14"))
    Queries.entries.filter(e => touched.contains(e.name)).foreach { e =>
      try {
        val df = e.fn(spark, dir)
        Files.writeString(Paths.get(s"plans/r14/${e.name}_$suffix.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        println(s"wrote ${e.name}_$suffix")
      } catch { case t: Throwable =>
        println(s"SKIP ${e.name}: $t") }
    }
    // The IVF-PQ codes-build intermediate — the join-elimination
    // diff. Both shapes are expressible with the final API (the old
    // one is pqEncode without carry + the id-join), so BOTH variants
    // dump from the `after` run; the `before` run skips this block.
    if (suffix == "after") try {
      import org.apache.spark.sql.functions._
      import graft.ops.Similarity
      val emb = graft.Tables.load(spark, dir, "embeddings")
      val proj = emb.select(col("vec_id"), col("embedding")).localCheckpoint()
      val cents = Similarity.kmeansCentroids(proj, 16, 2)
      val books = Similarity.pqTrain(proj, 8, 16, 2)
      val assigned = Similarity.assignClusters(proj, cents)
      // the old pipeline: encode, then re-attach cent_id by id-join
      val oldCodes = Similarity.pqEncode(proj, books, 8)
        .join(assigned.select(col("vec_id"), col("cent_id")), Seq("vec_id"))
        .select(col("cent_id"), col("vec_id"), col("sub"), col("code"))
      val newCodes = Similarity.pqEncode(assigned, books, 8,
          carryCols = Seq("cent_id"))
        .select(col("cent_id"), col("vec_id"), col("sub"), col("code"))
      Files.writeString(Paths.get("plans/r14/ivfpq_codes_build_before.txt"),
        oldCodes.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      Files.writeString(Paths.get("plans/r14/ivfpq_codes_build_after.txt"),
        newCodes.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      println("wrote ivfpq_codes_build_{before,after}")
    } catch { case t: Throwable => println(s"SKIP codes build: $t") }
    spark.stop()
  }
}
