package graft.lake

import org.apache.spark.sql.SparkSession

/** Table-maintenance entry point — the scheduled companion to
  * IngestJob that keeps a 100 TB store healthy: recover claims
  * orphaned by crashed writers, sweep their unreferenced commit dirs,
  * fold merge-on-read delete debt — equality-delete entries AND
  * positional deletion vectors, which each cost one broadcast
  * anti-join per read — once the combined count crosses a threshold
  * (`deleteDebt` gauges both; `DESCRIBE DETAIL` breaks out
  * `n_dv_entries`/`dv_bytes`), and vacuum old snapshots.
  *
  * {{{
  *   spark-submit --class graft.lake.MaintenanceJob app.jar \
  *     --store_root s3a://bucket/lake --table survey_details \
  *     --claim_ttl_ms 3600000 --compact_debt 8 --vacuum_keep 3
  * }}}
  */
object MaintenanceJob {

  final case class Args(storeRoot: String, table: String,
                        claimTtlMs: Long = 60 * 60 * 1000L,
                        compactDebt: Int = 8, vacuumKeep: Int = 3,
                        compactSmallBytes: Long = 0L)

  final case class Summary(recoveredClaims: Seq[Long],
                           sweptOrphanDirs: Seq[String],
                           compacted: Boolean,
                           smallFilesFolded: Int,
                           retainedVersions: Seq[Long],
                           txnsRolledForward: Seq[String] = Nil,
                           txnsRolledBack: Seq[String] = Nil,
                           bloomFilesIndexed: Int = 0)

  /** Defaults live ONLY on the Args case class; CLI flags override via
    * copy, so programmatic and CLI construction can't disagree. */
  def parseArgs(argv: Array[String]): Args = {
    val m = CliArgs.parse(argv, allowed = Set("store_root", "table",
      "claim_ttl_ms", "compact_debt", "vacuum_keep", "compact_small_bytes"))
    val base = Args(CliArgs.required(m, "store_root"),
      CliArgs.required(m, "table"))
    val withTtl = m.get("claim_ttl_ms").map(_.toLong)
      .fold(base)(v => base.copy(claimTtlMs = v))
    val withDebt = m.get("compact_debt").map(_.toInt)
      .fold(withTtl)(v => withTtl.copy(compactDebt = v))
    val withKeep = m.get("vacuum_keep").map(_.toInt)
      .fold(withDebt)(v => withDebt.copy(vacuumKeep = v))
    m.get("compact_small_bytes").map(_.toLong)
      .fold(withKeep)(v => withKeep.copy(compactSmallBytes = v))
  }

  /** One maintenance pass. Order matters: dead TRANSACTIONS resolve
    * first (a journaled crash mid-COMMIT rolls forward, an
    * unjournaled one rolls back — their claims and staged manifests
    * must not fall to blind takeover), then stale claims (unblocks
    * writers), orphan sweep (same TTL), compaction before vacuum
    * (vacuum then drops the superseded delete files once their
    * versions age out). */
  def run(spark: SparkSession, args: Args): Summary = {
    val store = new TableStore(spark, args.storeRoot)
    val (txnFwd, txnBack) = store.recoverTransactions(args.claimTtlMs)
    val claims = store.recoverStaleClaims(args.table, args.claimTtlMs)
    val orphans = store.vacuumOrphans(args.table, args.claimTtlMs)
    val compacted = store.deleteDebt(args.table) >= args.compactDebt
    if (compacted) store.compact(args.table)
    // small-file fold after debt compaction (it requires zero debt)
    // and before vacuum (the superseded tiny files age out with their
    // versions)
    val folded =
      if (args.compactSmallBytes > 0 && store.deleteDebt(args.table) == 0)
        store.compactSmall(args.table, args.compactSmallBytes)
      else 0
    store.vacuum(args.table, keep = args.vacuumKeep)
    // last: refresh existing bloom indexes over the post-compaction
    // file set (O(files without an entry)) so AUTOMATIC bloom skipping
    // stays effective without user action; a compaction rewrite makes
    // this the full rebuild the stale index needed anyway
    val bloomed = store.refreshBloomIndexes(args.table)
    Summary(claims, orphans, compacted, folded, store.versions(args.table),
      txnFwd, txnBack, bloomed)
  }

  def main(argv: Array[String]): Unit = {
    val args = parseArgs(argv)
    val spark = SparkSession.builder()
      .appName(s"graft-maintenance-${args.table}")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val s = run(spark, args)
    println(s"[graft] ${args.table}: claims=${s.recoveredClaims.mkString(",")} " +
      s"orphans=${s.sweptOrphanDirs.mkString(",")} compacted=${s.compacted} " +
      s"versions=${s.retainedVersions.mkString(",")}")
    spark.stop()
  }
}
