package graft.tools

import org.apache.spark.sql.SparkSession
import graft.queries.Queries
import java.nio.file.{Files, Paths}

/** Round-15 optimization evidence: formatted physical plans of the
  * queries this round's optimization pass touches, written to
  * `plans/r15/<query>_<suffix>.txt`. Run with suffix `before` on the
  * round-entry tree and `after` on the final tree:
  * `sbt "runMain graft.tools.DumpR15Plans before|after [sfDir]"`.
  *
  * Lifecycle queries (ANN/MV/store) execute their builds eagerly
  * inside the entry fn, so the dumped plan is the final SELECT's —
  * the build-side job-count evidence lives in ProfileQueries output
  * quoted in OPTIMIZATION_r15.md instead.
  */
object DumpR15Plans {
  private val touched = Seq(
    // correctness fix: single-file COPY INTO sources (FsListing)
    "copy_into_idempotent", "copy_into_evolving",
    // ANN lifecycle family — build commit batching / job-count work
    "ivf_ann_topk", "ivf_ann_persisted", "ivf_ann_incremental",
    "ivf_ann_after_delete", "ivf_ann_filtered", "ivf_ann_synced",
    "ivf_ann_streaming_ingest", "pq_ann_topk",
    "ivfpq_ann_persisted", "ivfpq_ann_after_delete",
    "ivfpq_ann_filtered", "ivfpq_ann_synced",
    // near-dup clustering loop
    "neardup_components", "neardup_canonical_keep",
    "training_export_e2e",
    // single-pass sketch / vocab builds
    "approx_sketches_lineitem",
    "bpe_token_budget_by_source", "bpe_piece_ids_export",
    // MV refresh family (if touched)
    "mv_incremental_refresh", "mv_approx_distinct", "mv_query_rewrite",
    // round-15 additive serve variants (after-only: they did not exist
    // at round entry)
    "ivf_ann_serve", "ivfpq_ann_serve", "mv_serve_rewrite")

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
    Files.createDirectories(Paths.get("plans/r15"))
    Queries.entries.filter(e => touched.contains(e.name)).foreach { e =>
      try {
        val df = e.fn(spark, dir)
        Files.writeString(Paths.get(s"plans/r15/${e.name}_$suffix.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        println(s"wrote ${e.name}_$suffix")
      } catch { case t: Throwable =>
        println(s"SKIP ${e.name}: $t") }
    }
    spark.stop()
  }
}
