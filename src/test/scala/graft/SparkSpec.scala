package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .getOrCreate()

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Files actually scanned (post-pruning) by every file-source scan
    * in the executed plan — descends into adaptive subtrees. Metrics
    * populate when the scan's partitions materialize, so an action
    * runs first. */
  def scannedFiles(df: org.apache.spark.sql.DataFrame,
                   pathContains: String = ""): Long = {
    df.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[Long] =
      p.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if pathContains.isEmpty || s.relation.location.rootPaths
              .exists(_.toString.contains(pathContains)) =>
          Seq(s.metrics("numFiles").value)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        // materialized AQE stages hide their subplan (children = Nil)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
      }.flatten
    scans(df.queryExecution.executedPlan).sum
  }
}
