package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Sketch-accelerated membership operators whose RESULTS are exact.
  *
  * Both operators here follow the same two-phase shape: a broadcast
  * one-sided-error sketch (Bloom filter / count-min sketch) prunes the
  * corpus WITHOUT a shuffle, then an exact pass verifies only the
  * survivors. Because the sketches err strictly toward keeping rows
  * (no false negatives for membership, no underestimates for counts),
  * the two-phase result is bit-identical to the exact single-phase
  * plan — so every query built on them stays DuckDB-oracle-checkable
  * while the heavy lifting scales like the sketch, not the data.
  *
  * Scale rationale (the decontamination case, Lee et al. "Deduplicating
  * Training Data Makes Language Models Better", arXiv:2107.06499):
  * benchmark n-grams number ~10^7-10^9 — too big to broadcast as a
  * join hash relation (strings, GBs) but small as Bloom BITS (~1.2 GB
  * at 10^9 keys / 1% fpp, ~120 MB at 10^8). The bloom pass answers
  * "definitely clean" for ~99% of a 100 TB corpus map-side; only the
  * fpp-sized suspect sliver pays the exact-join shuffle.
  *
  * The probes are NATIVE Catalyst expressions
  * ([[graft.functions.BloomMightContainLong]] over an `xxhash64` key
  * — the pre-hashed-long contract Spark's own runtime-filter rewrite
  * uses — and the codegen'd [[graft.functions.CmsAtLeast]]), so the
  * per-row hot path stays inside WholeStageCodegen: no UDF boxing,
  * no codegen fence. Either way the sketch bits ride an explicit
  * BROADCAST; the expressions reference the broadcast HANDLE, never
  * a plan literal (a 1.2 MB literal bloom measurably taxed every
  * driver-side tree copy). Set
  * `spark.graft.membership.nativeExpr=false` (or env
  * `SPARK_GRAFT_MEMBERSHIP_NATIVE=false`) to fall back to the
  * Scala-UDF probes (identical results). */
object Membership {

  private def nativeEnabled(df: DataFrame): Boolean = df.sparkSession.conf
    .get("spark.graft.membership.nativeExpr",
      sys.env.getOrElse("SPARK_GRAFT_MEMBERSHIP_NATIVE", "true")).toBoolean

  /** Bloom over the xxhash64 of the key's string form — longs into the
    * sketch, so the probe side can be the native long-typed
    * `BloomFilterMightContain` (its contract: values are pre-hashed
    * 64-bit, exactly how Spark's injected runtime filters work). */
  private def bloomOf(small: DataFrame, smallKey: Column,
                      expectedItems: Long, fpp: Double): BloomFilter =
    small.select(smallKey.cast("string").as("k"))
      .where(col("k").isNotNull)
      .select(xxhash64(col("k")).as("h"))
      .stat.bloomFilter("h", expectedItems, fpp)

  /** True iff the bloom MIGHT contain the key; NULL keys hash to the
    * xxhash64 seed (native) / probe false (udf fallback) — both
    * routes keep the final exact join as the decider, so results are
    * identical. The
    * sketch rides a BROADCAST either way; the native route merely
    * swaps the per-row UDF call for generated code referencing the
    * broadcast handle (a literal-embedded sketch was measured ~0.5 s
    * slower per query at sf0.1 — tree-copy cost on a MB-sized plan). */
  private def probeOf(big: DataFrame, bigKey: Column, bf: BloomFilter): Column = {
    val b = big.sparkSession.sparkContext.broadcast(bf)
    if (nativeEnabled(big))
      ColumnBridge.column(graft.functions.BloomMightContainLong(
        ColumnBridge.expression(xxhash64(bigKey.cast("string"))), b))
    else {
      val mc = udf((h: java.lang.Long) =>
        h != null && b.value.mightContainLong(h))
      mc(xxhash64(bigKey.cast("string")))
    }
  }

  /** `big LEFT ANTI JOIN small` accelerated by a broadcast Bloom
    * filter on `small`'s keys: rows failing the bloom probe are
    * definitely-clean and short-circuit past the join (no shuffle);
    * only bloom survivors (true matches + fpp false positives) are
    * verified by the exact anti join. NULL big-side keys never match
    * (SQL join semantics) and are kept. Result == the plain anti
    * join, independent of fpp.
    *
    * Stated trade-off: the clean/suspect union re-executes the
    * big-side SCAN (both branches are map-side only — no shuffle, no
    * cache). Two scans are the deliberate price for never shuffling
    * the corpus: the alternative exact anti join shuffles all of
    * `big` when `small` exceeds broadcast size — the exact regime
    * this operator exists for. If the input is an expensive derived
    * frame (not a bare scan), checkpoint it first or pay its pipeline
    * twice. */
  def bloomAntiJoin(big: DataFrame, bigKey: Column,
                    small: DataFrame, smallKey: Column,
                    expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val probe = probeOf(big, bigKey,
      bloomOf(small, smallKey, expectedItems, fpp))
    // NULL-key model: xxhash64 skips NULL inputs and yields its SEED,
    // so the native probe returns a real boolean for NULL keys — they
    // may land in either branch, and both are correct (clean keeps
    // them; the anti join keeps them since NULL never equals). The
    // coalesce exists for the UDF fallback's explicit null->false and
    // as belt-and-braces, not because the native probe returns NULL.
    val clean = big.where(!coalesce(probe, lit(false)))
    // alias the small side's key so `sh === sh`-style self-ambiguity
    // can't arise when both frames name the key identically
    val suspects = big.where(coalesce(probe, lit(false)))
      .join(small.select(smallKey.as("__mb_k")),
        bigKey === col("__mb_k"), "left_anti")
    clean.unionByName(suspects)
  }

  /** `big LEFT SEMI JOIN small` with the same broadcast-bloom
    * prefilter: bloom rejects are definitely-absent and leave the
    * plan before any shuffle; survivors are confirmed by the exact
    * semi join. Result == the plain semi join. */
  def bloomSemiJoin(big: DataFrame, bigKey: Column,
                    small: DataFrame, smallKey: Column,
                    expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val probe = probeOf(big, bigKey,
      bloomOf(small, smallKey, expectedItems, fpp))
    big.where(coalesce(probe, lit(false)))
      .join(small.select(smallKey.as("__mb_k")),
        bigKey === col("__mb_k"), "left_semi")
  }

  /** Exact heavy hitters — every key with frequency >= `minCount`,
    * with its exact count — at sketch cost: a count-min sketch
    * (treeAggregate: each partition ships an eps-width counter array,
    * never its rows) prunes the corpus to candidate keys, then the
    * exact groupBy counts only candidates. CMS never underestimates,
    * so the candidates are a guaranteed superset and the final
    * HAVING filter makes the result exactly the true heavy hitters.
    * The shuffle carries candidate rows only — for a Zipf-ish token
    * stream that is the head, not the 100 TB tail. NULL keys are not
    * counted (SQL aggregate semantics). Returns (key, cnt). */
  def heavyHitters(df: DataFrame, keyCol: Column, minCount: Long,
                   eps: Double = 1e-4, confidence: Double = 0.99,
                   seed: Int = 42): DataFrame = {
    require(minCount > 0, "minCount must be positive")
    val keyed = df.select(keyCol.cast("string").as("key"))
      .where(col("key").isNotNull)
    val cms = keyed.stat.countMinSketch("key", eps, confidence, seed)
    val b = keyed.sparkSession.sparkContext.broadcast(cms)
    val atLeast: Column =
      if (nativeEnabled(df))
        ColumnBridge.column(graft.functions.CmsAtLeast(
          ColumnBridge.expression(col("key")), b, minCount))
      else
        udf((s: String) => b.value.estimateCount(s) >= minCount)
          .apply(col("key"))
    keyed.where(atLeast)
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
  }
}
