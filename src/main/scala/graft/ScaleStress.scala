package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale validation: synthesize a K×-scaled dataset AT
  * RUNTIME (no fixtures written into the repo's test data), run the
  * most expensive registered queries at 1× and K×, and report each
  * query's scaling exponent `log(t_K / t_1) / log(K)` — ~1.0 is
  * linear, clearly >1 means some stage grows super-linearly and the
  * plan-shape arguments in docs/SCALE.md are wrong for that family.
  *
  * Synthesis = union of key-shifted copies, so referential integrity
  * holds (lineitem copies join their orders copies; copied orders
  * join copied customers) while dimension tables stay fixed — the
  * realistic shape of a warehouse growing 10×. Text and vector
  * payloads are PERTURBED per copy, not duplicated verbatim:
  *   - documents: per-copy vowel rotation + a copy marker token, so
  *     the near-dup family doesn't face K identical copies of every
  *     doc (which would grow candidate buckets quadratically by
  *     construction — not what corpus growth looks like). Copies c
  *     and c+5 share a rotation and differ only by the marker: each
  *     doc gains a handful of true near-dup partners — linear growth
  *     that EXERCISES the dedup path instead of degenerating it.
  *   - embeddings: per-copy circular shift of the vector (random-ish
  *     directions decorrelate under rotation), so ANN corpora grow
  *     without every probe gaining K exact-cosine duplicates.
  *
  * Usage: `runMain graft.ScaleStress [baseDir] [workDir] [K]`, query
  * list overridable via SPARK_GRAFT_STRESS_QUERIES. Prints a
  * markdown table plus one JSON line (machine-readable tail).
  */
object ScaleStress {

  /** The families whose 100 TB behavior SCALE.md argues from plan
    * shape: store pipelines, ANN, near-dup, retrieval, ranking, and
    * the heavy TPC-H joins. */
  private val DefaultQueries = Seq(
    "training_export_e2e", "sql_lifecycle_e2e", "cdc_pipeline_e2e",
    "pq_ann_topk", "ivf_ann_topk", "neardup_components",
    "minhash_lsh_neardup", "span_dedup_c4", "decontamination_overlap",
    "repetition_gopher_filters", "bm25_retrieval_topk",
    "hybrid_retrieval_rrf", "curriculum_quality_bins",
    "exact_percentiles_rank", "q9_product_profit", "q8_market_share",
    "mv_incremental_refresh", "mv_streaming_fresh")

  /** Far above any base key range, far below long overflow at K≤many. */
  private val Off = 1L << 36

  private def shifted(df: DataFrame, c: Int, keys: String*): DataFrame =
    keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(c * Off)))

  private val Vowels = "aeiou"
  private def rotVowels(c: Int): String = {
    val r = c % Vowels.length
    Vowels.drop(r) + Vowels.take(r)
  }

  /** One table's c-th copy (c = 0 is the identity). */
  private def copyOf(name: String, df: DataFrame, c: Int): Option[DataFrame] =
    name match {
      // dimensions don't scale with the fact tables
      case "region" | "nation" | "supplier" | "part" =>
        if (c == 0) Some(df) else None
      case "customer" => Some(shifted(df, c, "c_custkey"))
      case "orders" => Some(shifted(df, c, "o_orderkey", "o_custkey"))
      case "lineitem" => Some(shifted(df, c, "l_orderkey"))
      case "events" => Some(shifted(df, c, "event_id", "user_id"))
      case "documents" =>
        val base = shifted(df, c, "doc_id")
        if (c == 0) Some(base)
        else Some(base
          .withColumn("text", concat(
            translate(col("text"), Vowels, rotVowels(c)),
            lit(s" zcopy$c")))
          .withColumn("n_chars", length(col("text")).cast("long")))
      case "embeddings" =>
        val base = shifted(df, c, "vec_id")
        // rotate modulo the dimension (c can exceed it at K=100) and
        // nudge one component by a copy-dependent epsilon: a pure
        // rotation repeats every `dim` copies, which would hand the
        // ANN family exact-duplicate vectors again at K > dim
        val r = s"(($c) % size(embedding))"
        if (c == 0) Some(base)
        else Some(base.withColumn("embedding",
          expr(s"transform(concat(slice(embedding, $r + 1, size(embedding) - $r), " +
            s"slice(embedding, 1, $r)), (x, i) -> " +
            s"CAST(x + IF(i = 0, 1.0e-3 * (($c) % 97), 0.0) AS FLOAT))")))
      case _ => if (c == 0) Some(df) else None
    }

  /** Write the K×-scaled dataset under `workDir` (same layout as the
    * driver's sf dirs, so every registered query runs unchanged). */
  def synthesize(spark: SparkSession, baseDir: String, workDir: String,
                 k: Int): Unit = {
    val tables = new java.io.File(baseDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName.stripSuffix(".parquet"))
    tables.foreach { t =>
      val df = spark.read.parquet(s"$baseDir/$t.parquet")
      val scaled = (0 until k).flatMap(copyOf(t, df, _))
        .reduce(_.unionByName(_))
      scaled.write.mode("overwrite").parquet(s"$workDir/$t.parquet")
    }
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val workDir = args.lift(1).getOrElse("/tmp/graft_scale_stress")
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val names = sys.env.get("SPARK_GRAFT_STRESS_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(DefaultQueries)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is TIMESTAMP(NANOS): read as epoch-nanos long, the
      // same contract Tables.load gives every query (the synthesized
      // copy round-trips as plain int64 — identical values)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    System.err.println(s"[stress] synthesizing ${k}x of $baseDir -> $workDir")
    synthesize(spark, baseDir, workDir, k)

    def run(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val queries = names.flatMap(n => SparkEntry.queries.get(n).map(n -> _))
    names.filterNot(n => SparkEntry.queries.contains(n))
      .foreach(n => System.err.println(s"[stress] UNKNOWN query $n — skipped"))

    // JIT/codegen warmup at the tiny SF, as Bench does
    locally {
      val warmDir = "/root/testdata/sf0.001"
      if (new java.io.File(warmDir).isDirectory)
        queries.foreach { case (_, fn) =>
          try run(fn(spark, warmDir)) catch { case _: Throwable => () }
        }
    }
    def time(fn: (SparkSession, String) => DataFrame, dir: String): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        run(fn(spark, dir))
        (System.nanoTime() - t0) / 1e9
      }.min

    val rows = queries.map { case (name, fn) =>
      val t1 = time(fn, baseDir)
      val tk = time(fn, workDir)
      val exp = math.log(tk / t1) / math.log(k.toDouble)
      System.err.println(f"[stress] $name%-28s t1=$t1%7.2fs t$k=$tk%7.2fs exp=$exp%5.2f")
      (name, t1, tk, exp)
    }

    println(s"\n| query | t(1x) s | t(${k}x) s | exponent |")
    println("|---|---|---|---|")
    rows.sortBy(-_._4).foreach { case (n, t1, tk, e) =>
      println(f"| $n | $t1%.2f | $tk%.2f | $e%.2f |")
    }
    val flagged = rows.filter { case (_, _, tk, e) => e > 1.3 && tk > 2.0 }
    val js = rows.map { case (n, t1, tk, e) =>
      f""""$n":{"t1":$t1%.3f,"tk":$tk%.3f,"exp":$e%.3f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_stress","k":$k,"reps":$reps,"flagged":[${
      flagged.map("\"" + _._1 + "\"").mkString(",")}],"queries":$js}""")
    spark.stop()
  }
}
