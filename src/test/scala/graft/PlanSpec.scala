package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.Queries

/** Physical-plan shape assertions: the optimizations that matter at
  * 100 TB must actually appear in the plan, not be assumed.
  * (SURVEY §4: InferWindowGroupLimit is the main perf lever for the
  * dedup operator; filter/projection pushdown and broadcast joins are
  * the scale levers for scans and CDC merge.)
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("cdc dedup (row_number=1) plans a WindowGroupLimit, not a full sort-rank") {
    val p = plan(Queries.cdcDedupLatest.fn(spark, dir))
    assert(p.contains("WindowGroupLimit"), s"missing WindowGroupLimit:\n$p")
  }

  test("scan filter+projection push into the parquet reader") {
    val df = Tables.load(spark, dir, "lineitem")
      .where(col("l_quantity") > 49.0)
      .select("l_orderkey", "l_quantity")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,49.0)"),
      s"filter not pushed:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"columns not pruned:\n$p")
  }

  test("CDC merge anti-join broadcasts the (small) update side") {
    import spark.implicits._
    val target = spark.range(100000).select(col("id").as("key"), rand(7).as("v"))
    val updates = Seq(1L, 2L, 3L).toDF("key")
    val merged = graft.lake.CdcMerge.deleteMatched(target, updates, Seq("key"))
    val p = plan(merged)
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"expected broadcast anti join:\n$p")
  }

  test("q3 join keeps the explicitly-broadcast dimension broadcast") {
    val p = plan(Queries.q3TopOrders.fn(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
  }

  test("embedding near-dup generates candidates by equi-join, never all-pairs") {
    val p = plan(graft.queries.VectorQueries.embeddingNearDup.fn(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in the near-dup plan:\n$p")
  }

  test("winnowing and chunk-sharing plans contain no all-pairs join") {
    for (q <- Seq("winnow_fingerprint_pairs", "cdc_chunk_shared")) {
      val p = plan(Queries.queries(q)(spark, dir))
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"all-pairs join in $q:\n$p")
    }
  }

  test("KMV rank is two-stage: a bucketed window precedes the per-group window") {
    val p = plan(graft.ops.Sketches.kmvDistinct(
      Tables.load(spark, dir, "lineitem"), Seq("l_returnflag"), "l_partkey", 64))
    // stage 1 partitions by (group, hash bucket) — the pmod bucket is
    // pre-projected and renders as _w0 — stage 2 by group only, so no
    // group's full distinct-hash set ever sorts on one reducer; Spark
    // additionally prunes both stages with partial WindowGroupLimits
    assert("windowspecdefinition\\(l_returnflag#\\d+, _w0".r.findFirstIn(p).isDefined,
      s"no bucketed first window stage:\n$p")
    assert("Window ".r.findAllIn(p).size >= 2, s"missing a window stage:\n$p")
    assert(p.contains("WindowGroupLimit"), s"no top-k pruning:\n$p")
  }

  test("stratified exact sample prunes with WindowGroupLimit (ships n rows per stratum)") {
    val p = plan(graft.ops.Sampling.stratifiedExact(
      Tables.load(spark, dir, "documents"), "lang", "doc_id", 20, "s"))
    assert(p.contains("WindowGroupLimit"),
      s"no top-n pruning — a 100 TB stratum would ship whole:\n$p")
  }

  test("domain caps prune with WindowGroupLimit; DSIR joins broadcast the lambda table") {
    val p = plan(graft.ops.Sampling.capPerStratum(
      Tables.load(spark, dir, "documents"), "source", 20,
      Seq(org.apache.spark.sql.functions.col("n_chars").desc,
        org.apache.spark.sql.functions.col("doc_id"))))
    assert(p.contains("WindowGroupLimit"),
      s"no per-stratum pruning — a 100 TB domain would ship whole:\n$p")
    val docs = Tables.load(spark, dir, "documents")
    val w = graft.ops.Sampling.dsirLogWeights(docs,
      docs.where(org.apache.spark.sql.functions.col("lang") === "en"),
      "doc_id", "text", 64)
    val pw = plan(w)
    assert(pw.contains("BroadcastHashJoin"),
      s"lambda join should broadcast (<= buckets rows):\n$pw")
    // per-doc weight sum must partial-aggregate before the exchange
    assert(pw.contains("partial_sum") || pw.contains("Partial"),
      s"no map-side combine on the weight sum:\n$pw")
  }

  test("minhash band self-join reuses the signature exchange, not recomputes it") {
    // the candidate join's two sides are the same explode→groupBy
    // signature pipeline under different aliases; exchange reuse must
    // collapse them to ONE computation (signatures over the full corpus
    // are the expensive half of near-dedup)
    val df = Queries.queries("minhash_lsh_neardup")(spark, dir)
    df.collect() // finalize the adaptive plan
    val p = plan(df)
    assert(p.contains("ReusedExchange"),
      s"signature pipeline computed twice (no ReusedExchange):\n$p")
  }

  test("no registered query plans a partition-less (single-reducer) window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    // A Window with an empty partitionSpec moves the whole frame to one
    // reducer — the shape that dies at 100x. Sweep EVERY registered
    // query so a future query can't reintroduce one unnoticed.
    // catch per-query analysis failures so a fixture/type break reads as
    // "query X unanalyzable", not an opaque mid-sweep exception (r5 lesson)
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val bad = fn(spark, dir).queryExecution.optimizedPlan.collect {
            case w: LWindow if w.partitionSpec.isEmpty => w
          }
          if (bad.nonEmpty) Some(name) else None
        } catch { case e: Throwable =>
          Some(s"$name(UNANALYZABLE: ${String.valueOf(e.getMessage).take(120)})")
        }
    }
    assert(offenders.isEmpty,
      s"queries with a global (partition-less) window: $offenders")
  }

  test("no registered query plans an unbounded join (cartesian / unlisted BNLJ)") {
    // A CartesianProduct is never acceptable; a BroadcastNestedLoopJoin
    // is acceptable ONLY as a deliberate broadcast-small-side shape
    // (1-row stats cross joins, broadcast-probe ANN scans) — listed
    // here so a future query can't introduce one unnoticed.
    val bnljOk = Set(
      "cosine_topk_bruteforce",   // broadcast probes x corpus scan
      "hard_negative_mining",     // same broadcast-probe pool
      "bm25_retrieval_topk",      // 1-row corpus-stats cross join
      "hybrid_retrieval_rrf",     // both of the above
      "tfidf_top_terms",          // 1-row corpus-stats cross join
      "unigram_logprob_quality",  // 1-row token-total cross join
      "ivf_ann_topk",             // nlist-centroid broadcast cross-score
      "ivf_ann_persisted",        // same cross-score vs the stored centroids
      "ivf_ann_incremental",      // same cross-score (build + append path)
      "ivf_ann_streaming_ingest", // same cross-score (streamed appendTxn path)
      "ivf_ann_after_delete",     // same cross-score (post-delete search)
      "ivf_ann_filtered",         // same cross-score (attribute-filtered search)
      "ivf_ann_synced",           // same cross-score (CDF-synced index)
      "ivfpq_ann_persisted",      // coarse + codebook broadcast cross-scores
      "ivfpq_ann_after_delete",   // same cross-scores (post-delete search)
      "ivfpq_ann_filtered",       // same cross-scores (attribute-filtered)
      "ivfpq_ann_synced",         // same cross-scores (CDF-synced codes)
      "ivf_ann_serve",            // same cross-score (prebuilt-index serve)
      "ivfpq_ann_serve",          // same cross-scores (prebuilt-index serve)
      "quantized_ann_topk",       // broadcast probes x int8 corpus scan
      "mmr_diversified_topk",     // broadcast probes x int8 corpus scan
      "dq_audit_report",          // 1-row rule-aggregate cross joins
      "null_pruned_scan",         // 1-row x 1-row stats cross join
      "bigram_lm_perplexity")     // 1-row vocab-size cross join
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val p = fn(spark, dir).queryExecution.executedPlan.toString
          val cart = p.contains("CartesianProduct")
          val bnlj = p.contains("BroadcastNestedLoopJoin") && !bnljOk(name)
          if (cart) Some(s"$name(cartesian)")
          else if (bnlj) Some(s"$name(bnlj)") else None
        } catch { case e: Throwable =>
          Some(s"$name(UNANALYZABLE: ${String.valueOf(e.getMessage).take(120)})")
        }
    }
    assert(offenders.isEmpty, s"unbounded joins: $offenders")
  }

  test("repetition gate is shuffle-free: one exchange (output sort), no join/window/agg") {
    val p = plan(Queries.queries("repetition_gopher_filters")(spark, dir))
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, // rangepartitioning sort for ORDER BY only
      s"per-row gate should not shuffle:\n$p")
    assert(!p.contains("Join") && !p.contains("Window") &&
      !p.contains("HashAggregate"), s"per-row gate grew a heavy operator:\n$p")
  }

  test("runtime bloom filter can prune the fact side of a selective dim join") {
    // at 100 TB a selective dimension predicate should reach the fact
    // scan as an injected bloom filter before the shuffle; local
    // fixtures are below the size thresholds, so lower them to prove
    // the mechanism fires for our join shape
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = Tables.load(spark, dir, "lineitem")
      val dim = Tables.load(spark, dir, "part").where(col("p_size") === 1)
      val joined = fact.join(dim, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand").count()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.toLowerCase.contains("bloomfilter") ||
        p.contains("might_contain"),
        s"no runtime bloom filter injected:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("whole-stage codegen covers the q1 aggregation pipeline") {
    val df = Queries.q1PricingSummary.fn(spark, dir)
    df.collect() // finalize the adaptive plan
    val p = plan(df)
    // codegen'd operators render as "*(n) Op" in the final adaptive plan
    assert(p.contains("*(1)") || p.contains("WholeStageCodegen"),
      s"no codegen spans:\n$p")
    assert(p.contains("HashAggregate"), s"no hash aggregate:\n$p")
  }

  test("partial aggregation (map-side combine) precedes the q1 shuffle") {
    val qe = Queries.q1PricingSummary.fn(spark, dir).queryExecution
    // two HashAggregate nodes (partial + final) around one exchange
    val s = qe.executedPlan.toString
    assert("HashAggregate".r.findAllIn(s).size >= 2, s"no partial agg:\n$s")
  }
}
