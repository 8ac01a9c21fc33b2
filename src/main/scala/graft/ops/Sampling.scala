package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and corpus mixing for training-data
  * pipelines. `df.sample()` draws from a per-partition RNG — the
  * selection changes under repartitioning, retries, and engines, which
  * makes sampled corpora irreproducible. Hash gating fixes that: a row
  * is kept iff its md5-derived 48-bit hash (salted per decision) falls
  * under fraction * 2^48. The SAME rows are selected on any engine,
  * any partitioning, any run — and different salts give independent
  * decisions, so a 10% eval split can't correlate with a 50%
  * training-mix gate. Pure codegen'd expressions, no RNG state, scan
  * parallel at any scale.
  *
  * Null ids hash to null and are DROPPED (the comparison is null) —
  * matching SQL `||` concatenation semantics, so the oracle agrees;
  * sample after assigning ids. All gates compare hash-as-double
  * against fraction * 2^48 so every API admits the same boundary rows.
  */
object Sampling {

  /** Keep rows whose salted hash of `idCol` falls under `fraction`. */
  def hashGate(id: Column, fraction: Double, salt: String): Column = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    // concat (not concat_ws): a null id must propagate to a null hash,
    // as the oracle's || does — concat_ws would silently give every
    // null-id row the identical decision
    Sketches.hash48(concat(id.cast("string"), lit(":" + salt)))
      .cast("double") < fraction * Sketches.Space
  }

  def hashSample(df: DataFrame, idCol: String, fraction: Double,
                 salt: String): DataFrame =
    df.where(hashGate(col(idCol), fraction, salt))

  /** Exact-size deterministic stratified sample: the `n` rows of each
    * stratum whose salted hash ranks smallest — hash-gating's
    * fixed-COUNT counterpart (a fraction gate yields a binomial-sized
    * sample; eval sets and per-source quotas need exact counts).
    * Selection is still engine/partitioning/run-independent: the hash
    * is the order, the id the tiebreak. One partitioned window per
    * stratum — rank pruning (WindowGroupLimit) keeps the shuffle at
    * ≤ n rows per (stratum, map partition), so a 100 TB stratum ships
    * n rows, not its population. */
  def stratifiedExact(df: DataFrame, strataCol: String, idCol: String,
                      n: Int, salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n > 0, "sample size must be positive")
    val h = Sketches.hash48(concat(col(idCol).cast("string"), lit(":" + salt)))
    val w = Window.partitionBy(strataCol).orderBy(col("__sh"), col(idCol))
    df.withColumn("__sh", h)
      .withColumn("__sr", row_number().over(w))
      .where(col("__sr") <= n)
      .drop("__sh", "__sr")
  }

  /** Deterministic weighted sampling without replacement per stratum
    * (Efraimidis-Spirakis A-ES): each row draws the reproducible
    * uniform u = (hash48(id:salt)+1)/2^48 ∈ (0,1] and competes on the
    * exponential key -ln(u)/w — the n smallest keys per stratum win,
    * giving inclusion probability proportional to `weight` (which must
    * be > 0). Quality-weighted corpus selection with the same
    * engine/partitioning/run-independence as [[hashGate]], and the
    * same WindowGroupLimit rank-pruned shuffle shape as
    * [[stratifiedExact]] — a 100 TB stratum ships n rows, not its
    * population. Rows with a NULL id or a NULL/non-positive weight are
    * dropped up front (same null-drop contract as [[hashGate]]):
    * without the guard their sort key would be NULL and Spark's
    * NULLS-FIRST ascending order would hand them every sample slot. */
  def weightedSample(df: DataFrame, strataCol: String, idCol: String,
                     weight: Column, n: Int, salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n > 0, "sample size must be positive")
    val u = (Sketches.hash48(concat(col(idCol).cast("string"),
      lit(":" + salt))).cast("double") + lit(1.0)) / lit(Sketches.Space)
    val w = Window.partitionBy(strataCol).orderBy(col("__wk"), col(idCol))
    df.where(col(idCol).isNotNull && weight > lit(0))
      .withColumn("__wk", -log(u) / weight)
      .withColumn("__wr", row_number().over(w))
      .where(col("__wr") <= n)
      .drop("__wk", "__wr")
  }

  /** Temperature-scaled mixture quotas (the multilingual / source-
    * mixing staple — mT5/CC-style α-smoothing): per-stratum quota ∝
    * count^α, scaled to `total`, integerized by floor +
    * largest-remainder (ties: remainder desc, stratum asc) and capped
    * at the stratum's population. α < 1 upsamples small strata
    * relative to their raw share; α = 1 is proportional; α = 0 is
    * uniform-across-strata. Pure driver-side arithmetic on the
    * (numStrata)-row count vector; deterministic given the counts
    * (sqrt/pow and IEEE doubles, inputs iterated in stratum order). */
  def temperatureQuotas(counts: Seq[(String, Long)], alpha: Double,
                        total: Long): Seq[(String, Long)] = {
    require(alpha >= 0 && total >= 0, "need alpha >= 0, total >= 0")
    val sorted = counts.sortBy(_._1)
    val w = sorted.map { case (_, n) =>
      if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha)
    }
    val sumW = w.sum
    if (sumW == 0) return sorted.map { case (s, _) => s -> 0L }
    val raw = w.map(_ / sumW * total)
    val floors = raw.map(math.floor(_).toLong)
    var left = total - floors.sum
    val order = raw.zip(floors).zipWithIndex
      .map { case ((r, f), i) => (r - f, i) }
      .sortBy { case (rem, i) => (-rem, sorted(i)._1) }
    val bump = Array.fill(sorted.size)(0L)
    for ((_, i) <- order if left > 0) { bump(i) = 1L; left -= 1 }
    sorted.zipWithIndex.map { case ((s, n), i) =>
      s -> math.min(n, floors(i) + bump(i))
    }
  }

  /** Temperature-scaled mixture SAMPLE: [[temperatureQuotas]] per
    * stratum, then a deterministic uniform A-ES draw fills each quota
    * — rank by the reproducible hash48 uniform within the stratum,
    * keep rank ≤ quota (broadcast-joined, numStrata rows). Same
    * WindowGroupLimit rank-pruned shape as [[stratifiedExact]]: a
    * 100 TB stratum ships its quota, not its population. The counts
    * collect is one (numStrata)-row aggregate. Null ids drop (their
    * sort key would be NULL-first), identically on both engines. */
  def temperatureSample(df: DataFrame, strataCol: String, idCol: String,
                        alpha: Double, total: Long, salt: String)
      : (DataFrame, Seq[(String, Long)]) = {
    import org.apache.spark.sql.expressions.Window
    // NULL strata drop with the NULL ids: quotas key by stratum VALUE
    // (a null key would NPE the driver-side quota map), and a mixture
    // weight for "unknown source" is a modeling decision the caller
    // should make explicitly by filling the column first
    // one canonical STRING rendering of the stratum on the data side:
    // counting, quota keys, and the quota join all use the same Spark
    // `cast(string)` — never the driver-side Java toString, which can
    // disagree with the cast for timestamp/decimal/boolean strata and
    // silently leave a stratum quota-less
    val base = df.where(col(idCol).isNotNull && col(strataCol).isNotNull)
      .withColumn("__s", col(strataCol).cast("string"))
    val counts = base.groupBy("__s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    val quotas = temperatureQuotas(counts, alpha, total)
    val qDf = df.sparkSession.createDataFrame(quotas)
      .toDF("__s", "__quota")
    val u = Sketches.hash48(concat(col(idCol).cast("string"),
      lit(":" + salt)))
    val w = Window.partitionBy("__s").orderBy(col("__u"), col(idCol))
    // the LITERAL max-quota conjunct is what lets Spark plan a
    // WindowGroupLimit (rank pruning needs a literal bound); the
    // per-stratum column conjunct then refines to the exact quota
    val maxQ = quotas.map(_._2).foldLeft(0L)(math.max)
    (base
      .join(broadcast(qDf), "__s")
      .withColumn("__u", u)
      .withColumn("__tr", row_number().over(w))
      .where(col("__tr") <= lit(maxQ) && col("__tr") <= col("__quota"))
      .drop("__s", "__u", "__tr", "__quota"), quotas)
  }

  /** Per-stratum cap by an explicit preference order — domain caps, the
    * web-curation staple (keep at most `n` documents per source/domain,
    * best-first, so one mirror-heavy domain can't dominate the mix).
    * `order` ranks within the stratum (e.g. quality desc); callers must
    * end it with a unique tiebreak for determinism. Same
    * WindowGroupLimit shape as `stratifiedExact`: rank pruning ships
    * ≤ n rows per (stratum, map partition), so a 100 TB stratum
    * contributes n rows to the shuffle, not its population. */
  def capPerStratum(df: DataFrame, strataCol: String, n: Int,
                    order: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n > 0, "cap must be positive")
    val w = Window.partitionBy(strataCol).orderBy(order: _*)
    df.withColumn("__cr", row_number().over(w))
      .where(col("__cr") <= n)
      .drop("__cr")
  }

  /** Deterministic shuffle-and-shard assignment: every row lands in
    * one of `numShards` export shards by salted hash — the layout
    * step of a training-data export. The hash IS the global shuffle
    * (readers consuming shards in hash order see a reproducible
    * pseudo-random document order), and the assignment is a pure
    * expression: identical on any engine, any partitioning, any run,
    * so a resumed or re-run export writes the same shards. */
  def shardAssign(id: Column, numShards: Int, salt: String): Column = {
    require(numShards > 0, "numShards must be positive")
    pmod(Sketches.hash48(concat(id.cast("string"), lit(":" + salt))),
      lit(numShards.toLong))
  }

  /** DSIR importance log-weights (Data Selection via Importance
    * Resampling, Xie et al., NeurIPS 2023): score every raw document
    * by how much its hashed-bigram profile resembles a TARGET corpus
    * rather than the raw corpus — the standard way to select
    * pretraining data that "looks like" a curated set without a
    * trained classifier.
    *
    * Features are hashed bigram buckets (`hash48(gram) % buckets`,
    * counted WITH multiplicity). Per-bucket log-ratios
    * `λ_b = ln((t_b+1)/(T+B)) − ln((r_b+1)/(R+B))` (add-one smoothing)
    * derive from two bucket-count aggregates of ≤ `buckets` rows each,
    * so the λ table broadcasts; a document's log-weight is
    * `Σ λ_bucket(gram)` over its gram occurrences — one explode +
    * broadcast join + per-doc sum whose map-side partial collapses a
    * document's grams before the exchange, so the one shuffle carries
    * O(documents) rows at any corpus size. Documents with no bigrams
    * (empty text) have no profile and are absent from the result.
    *
    * Returns (idCol, dsir_logw). Deterministic given the inputs — no
    * RNG, no engine-specific hashing (md5-derived buckets). */
  def dsirLogWeights(raw: DataFrame, target: DataFrame, idCol: String,
                     textCol: String, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    def grams(df: DataFrame) = df.select(col(idCol),
      explode(TextOps.ngrams(col(textCol), 2)).as("__g"))
      .select(col(idCol),
        pmod(Sketches.hash48(col("__g")), lit(buckets.toLong)).as("__b"))
    val rawB = grams(raw)
    val tgtB = grams(target)
    // the bucket profiles are <= `buckets` rows: land them on the
    // driver once and build the λ table there — corpus totals fall out
    // of the same aggregates (no separate count() jobs) and the
    // full-outer bucket join disappears. One pass over each corpus for
    // the profiles, one over raw for the weights; nothing else.
    def profile(b: DataFrame): Map[Long, Long] =
      b.groupBy("__b").agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rc = profile(rawB)
    val tc = profile(tgtB)
    val rTot = rc.values.sum.toDouble
    val tTot = tc.values.sum.toDouble
    val lam = (0L until buckets).map { b =>
      (b, math.log((tc.getOrElse(b, 0L) + 1) / (tTot + buckets)) -
        math.log((rc.getOrElse(b, 0L) + 1) / (rTot + buckets)))
    }
    val spark = raw.sparkSession
    import spark.implicits._
    rawB.join(broadcast(lam.toDF("__b", "__lam")), Seq("__b"))
      .groupBy(idCol)
      .agg(sum("__lam").as("dsir_logw"))
  }

  /** DSIR selection: keep the `k` raw documents with the highest
    * Gumbel-perturbed log-weight. The Gumbel noise
    * `g = −ln(−ln(u))` uses the salted document hash as `u` — the
    * paper's Gumbel-top-k importance resampling, but reproducible:
    * the same documents are selected on any engine, partitioning, or
    * run. Top-k is a TakeOrdered (per-partition heads + driver merge),
    * never a global sort. */
  def dsirResample(raw: DataFrame, target: DataFrame, idCol: String,
                   textCol: String, buckets: Int, k: Int,
                   salt: String): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (Sketches.hash48(concat(col(idCol).cast("string"),
      lit(":" + salt))) + 1).cast("double") / (Sketches.Space + 1)
    dsirLogWeights(raw, target, idCol, textCol, buckets)
      .withColumn("dsir_score", col("dsir_logw") - log(-log(u)))
      .orderBy(col("dsir_score").desc, col(idCol))
      .limit(k)
  }

  /** Mix sources at per-source rates in ONE pass over a combined
    * frame: `rates` maps values of `sourceCol` to keep-fractions
    * (missing sources use `defaultRate`). The gate composes as a
    * single when-chain, so mixing N sources costs one scan, not N. */
  def mixBySource(df: DataFrame, sourceCol: String, idCol: String,
                  rates: Map[String, Double], defaultRate: Double,
                  salt: String): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0 && r <= 1, s"rate $r not in [0,1]"))
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col(sourceCol) === s, r).otherwise(acc)
    }
    df.where(Sketches.hash48(
        concat(col(idCol).cast("string"), lit(":" + salt)))
      .cast("double") < rate * Sketches.Space)
  }
}
