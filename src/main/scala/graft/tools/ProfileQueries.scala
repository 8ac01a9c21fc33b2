package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import graft.queries.Queries
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Per-query cost profile: wall seconds, Spark job/stage/task counts,
  * shuffle bytes. The lifecycle-heavy queries (ANN/MV/SQL e2e) run tens
  * of jobs on KB-sized data, so their bench cost is fixed overhead —
  * this tool is how the round-14 optimization pass attributes it.
  * Usage: SPARK_GRAFT_PROFILE_ONLY=q1,q2 sbt "runMain graft.tools.ProfileQueries [sfDir]"
  */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shufWrite = new AtomicLong(0L)
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobTimes = new java.util.concurrent.ConcurrentLinkedQueue[(Double, String)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        // label by the result stage's call site (short form) — the
        // "collect at Foo.scala:123" string the UI shows
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(j.stageInfos.lastOption.map(_.name))
          .getOrElse("")
        jobStart.put(j.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobStart.remove(j.jobId)).foreach { case (t0, desc) =>
          jobTimes.add(((System.nanoTime() - t0) / 1e9, desc))
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        shufWrite.addAndGet(
          s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val only = sys.env.get("SPARK_GRAFT_PROFILE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val profiled = only match {
      case Some(names) => SparkEntryQueries().filter(kv => names(kv._1))
      case None => SparkEntryQueries()
    }
    // warm codegen once at the tiny SF
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      profiled.foreach { case (_, fn) =>
        try run(fn(spark, warmDir)) catch { case _: Throwable => () }
      }
    println(f"${"query"}%-32s ${"sec"}%8s ${"jobs"}%6s ${"stages"}%7s ${"tasks"}%7s ${"shufMB"}%8s")
    val detail = sys.env.contains("SPARK_GRAFT_PROFILE_DETAIL")
    profiled.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      jobs.set(0); stages.set(0); tasks.set(0); shufWrite.set(0L)
      jobTimes.clear(); jobStart.clear()
      val t0 = System.nanoTime()
      val ok = try { run(fn(spark, sfDir)); true }
        catch { case e: Throwable =>
          System.err.println(s"$name FAILED: $e"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a moment to drain
      Thread.sleep(150)
      if (ok) {
        println(f"$name%-32s $sec%8.2f ${jobs.get}%6d ${stages.get}%7d ${tasks.get}%7d ${shufWrite.get / 1e6}%8.1f")
        if (detail) {
          import scala.jdk.CollectionConverters._
          val jt = jobTimes.asScala.toSeq.sortBy(-_._1)
          val shown = jt.take(15)
          shown.foreach { case (s, d) =>
            println(f"    job $s%6.3fs  ${d.take(90)}") }
          if (jt.size > 15)
            println(f"    (+${jt.size - 15} more jobs, ${jt.drop(15).map(_._1).sum}%.3fs)")
        }
      }
    }
    spark.stop()
  }

  private def SparkEntryQueries(): Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
    graft.SparkEntry.queries
}
