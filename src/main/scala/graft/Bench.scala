package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Materialize through the noop sink: unlike count(), which lets
    // Catalyst prune every per-row projection a pure-scalar query does,
    // a noop write evaluates the full pipeline — all rows, all columns
    // — without paying for an actual file write.
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // Optional comma-separated name filter for iterating on one query
    // without paying for the whole suite (dev tool; the driver leaves
    // it unset and benches everything).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val benched = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    // Warm up JIT + Janino codegen: run every query once at the tiny SF
    // so the timed runs measure execution, not whole-stage-codegen
    // class compilation (which dominates complex plans run cold).
    locally {
      import org.apache.spark.sql.functions._
      spark.range(1000000).select(sum("id")).collect()
      val warmDir = "/root/testdata/sf0.001"
      if (new java.io.File(warmDir).isDirectory)
        benched.foreach { case (_, fn) =>
          try run(fn(spark, warmDir)) catch { case _: Throwable => () }
        }
    }
    // Epoch canary: a fixed pure-Spark workload (no graft code, no
    // testdata) timed right before the measured run. The box this
    // bench runs on demonstrably drifts 1.1-1.6x within a round under
    // sustained 32-thread load, which exceeded the tripwire's 1.5x
    // threshold two rounds running — per-query times only compare
    // within a box epoch, so the canary measures THIS run's epoch and
    // tools/bench_compare.py scales every baseline by the ratio of
    // run-canary to baseline-canary. Three legs cover the three cost
    // shapes the suite is made of: codegen'd CPU, a hash-agg shuffle,
    // and a sort; min-of-3 per leg, same contention discipline as the
    // measured queries.
    val canarySec: Double = {
      import org.apache.spark.sql.functions._
      val legs: Seq[() => Unit] = Seq(
        () => run(spark.range(60000000L)
          .select(sum((col("id") * 2654435761L) % 1000003).as("s"))),
        () => run(spark.range(8000000L)
          .groupBy((col("id") % 262144).as("k"))
          .agg(count(lit(1)).as("n"), sum("id").as("s"))),
        () => run(spark.range(4000000L)
          .select(hash(col("id")).as("h")).orderBy("h")))
      legs.foreach(f => f()) // warm the canary's own codegen
      legs.map { f =>
        (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          f()
          (System.nanoTime() - t0) / 1e9
        }.min
      }.sum
    }
    // IO canary: the three legs above are pure CPU/shuffle/sort, so a
    // page-cache/IO-contended epoch reads as a HEALTHY (even fast)
    // canary while every testdata-touching query runs slow — exactly
    // the round-13 driver artifact (canary 0.84s vs 1.14 baseline,
    // suite +20%). This leg times full-column scans of the real
    // fixture files through the noop sink — the same read shape every
    // measured query starts from. Warmed once (the measured queries
    // re-read these fixtures every rep, so warm-cache is the honest
    // comparison state), min-of-3; tools/bench_compare.py scales
    // baselines by max(cpu ratio, io ratio).
    val ioCanarySec: Double = {
      val fixtures = Seq("lineitem.parquet", "events.parquet",
        "orders.parquet", "embeddings.parquet")
        .map(new java.io.File(sfDir, _)).filter(_.exists)
      if (fixtures.isEmpty) 0.0
      else {
        val leg = () => fixtures.foreach(f =>
          run(spark.read.parquet(f.toString)))
        leg()
        (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          leg()
          (System.nanoTime() - t0) / 1e9
        }.min
      }
    }
    // Time each query N times and report the MIN: a single contended
    // sample on a shared host can read 5-10x slower than the query's
    // true cost and fake a regression. The max is kept as a noise gauge
    // (queries_max) so a run can be judged trustworthy at a glance.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val raw = benched.toSeq.sortBy(_._1).map { case (name, fn) =>
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { run(fn(spark, sfDir)); true }
          catch { case _: Throwable => false }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      // min over SUCCESSFUL reps only: a failing rep returns almost
      // instantly and would otherwise win the min, reporting a fake
      // speedup that hides both the failure and any real regression
      val good = samples.collect { case (t, true) => t }
      (name, good)
    }
    // A query with zero successful reps is a FAILURE, not a data point:
    // folding its fail-fast wall time into the pool let round 5 report a
    // fake "speedup" from 18 crashing queries. Report failures by name
    // and keep them out of every timing aggregate.
    val failed = raw.collect { case (name, good) if good.isEmpty => name }
    val results = raw.collect { case (name, good) if good.nonEmpty =>
      (name, good.min, good.max) }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val qsMax = results.map { case (k, _, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // every successful rep, in run order — the substrate for
    // median-of-N re-base protocols (min and max alone cannot give a
    // median past reps=2); rides only the file artifact
    val qsReps = raw.collect { case (name, good) if good.nonEmpty =>
      s"\"" + name + "\":" + good.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val fullJson = s"""{"metric":"total","value":$total,"unit":"sec","canary_sec":$canarySec,"io_canary_sec":$ioCanarySec,"queries":$qs,"queries_max":$qsMax,"queries_reps":$qsReps,"reps":$reps,"failed":${failed.size},"errors":$errs,"sf":"$sfDir"}"""
    println(fullJson)
    // The full record must survive log truncation: the driver keeps only
    // the tail of stdout, so round 9's official artifact carried
    // "parsed": null and the per-query map was lost. Persist the complete
    // JSON to a file at the repo root (override via SPARK_GRAFT_BENCH_OUT);
    // tools/bench_compare.py reads it directly.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "bench_last.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (fullJson + "\n").getBytes("UTF-8"))
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] could not write $outFile: $e") }
    // Second, COMPACT record: the driver's capture keeps only the tail of
    // stdout, and the full line above ends in the queries_max noise gauge —
    // round 3's official bench record preserved only worst-rep contention
    // samples and lost both the total and the min-of-N values. This short
    // line is what a tail capture retains: the headline total, rep count,
    // query count, and the 5 slowest queries as [min, max] — min is the
    // true cost, and a max far above it makes host contention self-evident
    // from the tail alone (round 6's 5 s "regression" was exactly that).
    val slowest = results.sortBy(-_._2).take(5)
      .map { case (k, mn, mx) => s"\"" + k + s"\":[$mn,$mx]" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","canary_sec":$canarySec,"io_canary_sec":$ioCanarySec,"nqueries":${results.size},"reps":$reps,"failed":${failed.size},"errors":$errs,"slowest":$slowest,"sf":"$sfDir"}""")
    if (failed.nonEmpty)
      System.err.println(s"[bench] ${failed.size} queries FAILED all reps: " +
        failed.mkString(", "))
    spark.stop()
  }
}
