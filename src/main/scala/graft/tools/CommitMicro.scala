package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-benchmark of the store's commit fixed overhead: N tiny
  * commits (create + appends) against a scratch store, with wall
  * time per phase from JobLabel-visible job times vs total. Run:
  * `sbt "runMain graft.tools.CommitMicro [n]"`. */
object CommitMicro {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("commit-micro").toString
    val store = new graft.lake.TableStore(spark, root)
    val df = (1 to 5).map(i => (i, s"v$i")).toDF("id", "v")
    // warm
    store.create("warm", df)
    (1 to 3).foreach(_ => store.append("warm", df))
    // timed: create
    val t0 = System.nanoTime()
    store.create("t", df)
    val tCreate = (System.nanoTime() - t0) / 1e9
    // timed: appends
    val t1 = System.nanoTime()
    (1 to n).foreach(_ => store.append("t", df))
    val tAppend = (System.nanoTime() - t1) / 1e9
    // timed: reads (statsScan per commit group)
    val t2 = System.nanoTime()
    (1 to 5).foreach(_ => store.read("t").write.format("noop")
      .mode("overwrite").save())
    val tRead = (System.nanoTime() - t2) / 1e9
    // timed: plain parquet writes of the same frame, no store
    val t3 = System.nanoTime()
    (1 to n).foreach(i => df.write.mode("overwrite")
      .parquet(s"$root/plain-$i"))
    val tPlain = (System.nanoTime() - t3) / 1e9
    // timed: noop writes of the same frame (job floor, no FS)
    val t4 = System.nanoTime()
    (1 to n).foreach(_ => df.write.format("noop").mode("overwrite").save())
    val tNoop = (System.nanoTime() - t4) / 1e9
    println(f"create: $tCreate%.3f s")
    println(f"append x$n: $tAppend%.3f s (${tAppend / n}%.3f s each)")
    println(f"read x5 (${n + 1} groups): $tRead%.3f s (${tRead / 5}%.3f s each)")
    println(f"plain parquet write x$n: $tPlain%.3f s (${tPlain / n}%.3f s each)")
    println(f"noop write x$n: $tNoop%.3f s (${tNoop / n}%.3f s each)")
    spark.stop()
  }
}
