package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (a CDC stream's reality: one tenant /
  * one key dominating a batch would stall a single reducer at 100 TB).
  *
  * Two standard levers, engine-provided so pipelines don't hand-roll
  * them:
  *  - salted two-stage aggregation: shuffle on (key, salt) first, so a
  *    hot key fans out over `salts` reducers, then combine the partial
  *    aggregates with a second (tiny) shuffle on key;
  *  - salted broadcast-side replication for joins when the small side
  *    can be replicated per salt.
  * AQE's skew-join splitting (spark.sql.adaptive.skewJoin) covers the
  * sort-merge case at runtime; these helpers cover aggregations and
  * deliberate layouts.
  */
object Skew {

  /** Two-stage salted sum/count aggregation: returns one row per key
    * with sum(valueCol) and count, never putting a whole hot key on a
    * single reducer in the first stage. */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: String,
                     salts: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(col(keyCol), monotonically_increasing_id()), lit(salts)))
    salted.groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(keyCol))
      .agg(sum("_psum").as("sum_value"), sum("_pcnt").as("n"))
  }

  /** Salted join for a skewed fact against a small dimension: the fact
    * side gets a random salt in [0, salts); the dimension is replicated
    * once per salt value, so each (key, salt) bucket joins locally.
    * Use when the dimension is broadcastable anyway but AQE's skew
    * split is unavailable (e.g. hash-partitioned pre-shuffles). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keyCol: String,
                 salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(col(keyCol), monotonically_increasing_id()), lit(salts)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicatedDim, Seq(keyCol, "_salt")).drop("_salt")
  }
}
