package graft.lake

import org.apache.spark.sql.SparkSession

/** Job-description labels around the engine's driver actions (guide
  * §1.5): a lifecycle query runs 40–90 Spark jobs, and without labels
  * every AQE stage job reads as `withThreadLocalCaptured at
  * CompletableFuture.java` in the UI/listeners — unattributable. The
  * description is a thread-local the AQE sub-jobs inherit, so one
  * label around an action covers its whole query-stage tree. Restores
  * the previous label (labels nest). */
object JobLabel {
  def apply[T](spark: SparkSession, label: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(label)
    try body finally sc.setJobDescription(prev)
  }
}
