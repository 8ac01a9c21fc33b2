package graft.lake

import org.apache.spark.sql.SparkSession
import graft.ops.Cdc

/** Job entry point mirroring the reference's Glue bootstrap (C4:
  * getResolvedOptions + Job.init/commit, icberg/iceberg_tables.py:11-17,
  * :157-213): a reference user swaps their Glue job submit for
  *
  * {{{
  *   spark-submit --class graft.lake.IngestJob app.jar \
  *     --src_path s3a://bucket/cdc/ --store_root s3a://bucket/lake \
  *     --dest_table survey_details --pk survey_details_id \
  *     --date_col process_date
  * }}}
  *
  * and gets the same full-load / incremental dispatch, partition-column
  * stripping, op-column fallback and tombstone semantics.
  */
object IngestJob {

  final case class Args(srcPath: String, storeRoot: String, destTable: String,
                        pk: String, dateCol: String, floorDate: String,
                        tiebreak: Seq[String] = Nil,
                        bucketFormat: Option[String] = None,
                        mergeOnRead: Boolean = false)

  /** getResolvedOptions equivalent: --key value pairs, with defaults
    * matching the reference's job parameters. Merge-strategy flags:
    * `--bucket_format yyyy-MM` (partition-scoped rewrite),
    * `--merge_on_read true` (equality deletes, zero rewrite),
    * `--tiebreak col1,col2` (deterministic dedup order). */
  def parseArgs(argv: Array[String]): Args = {
    val m = CliArgs.parse(argv, allowed = Set("src_path", "store_root",
      "dest_table", "pk", "date_col", "floor_date", "tiebreak",
      "bucket_format", "merge_on_read"))
    def req(k: String) = CliArgs.required(m, k)
    Args(req("src_path"), req("store_root"), req("dest_table"),
      m.getOrElse("pk", "key"),
      m.getOrElse("date_col", "process_date"),
      m.getOrElse("floor_date", "1900-01-01 00:00:00"),
      m.get("tiebreak").toSeq.flatMap(_.split(","))
        .map(_.trim).filter(_.nonEmpty),
      m.get("bucket_format"),
      m.get("merge_on_read").exists {
        case "true" => true
        case "false" => false
        case other => throw new IllegalArgumentException(
          s"--merge_on_read expects true or false, got $other")
      })
  }

  /** The reference's `main` flow (icberg/iceberg_tables.py:157-213). */
  def run(spark: SparkSession, args: Args): CdcIngest.Outcome = {
    val store = new TableStore(spark, args.storeRoot)
    val source = spark.read.option("mergeSchema", "true").parquet(args.srcPath)
    CdcIngest.ingest(spark, store, args.destTable, source,
      CdcIngest.Config(args.pk, args.dateCol, args.floorDate,
        args.tiebreak, args.bucketFormat, args.mergeOnRead))
  }

  def main(argv: Array[String]): Unit = {
    val args = parseArgs(argv)
    val spark = SparkSession.builder()
      .appName(s"graft-ingest-${args.destTable}")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val outcome = run(spark, args)
    println(s"[graft] ${args.destTable}: $outcome") // Job.commit analogue
    spark.stop()
  }
}
