package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage: blocked fuzzy matching over a string key — the
  * entity-resolution primitive a curation pipeline needs to merge
  * near-identical catalog/source names before dedup or joins.
  *
  * Scale design (100 TB): never a string-distance theta join. The
  * match runs over DISTINCT names (distinct names << rows — an
  * aggregate first), candidates come from an equi-join on a cheap
  * blocking key, and the edit-distance verify runs only inside blocks.
  * Recall is governed by the blocking function (same contract as LSH
  * bands: a pair in different blocks is out of scope by design), so
  * callers pick keys that survive the edits they care about.
  */
object Linkage {

  /** Fuzzy near-match pairs (`name_a < name_b`) among the distinct
    * values of `nameCol`, blocked by `blockKey`, verified by
    * levenshtein ≤ `maxDist`. Output carries each side's row support
    * so the caller can pick a canonical form (highest support wins).
    */
  def blockedFuzzyPairs(df: DataFrame, nameCol: String,
                        blockKey: Column => Column,
                        maxDist: Int): DataFrame = {
    val names = df.groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("support"))
      .withColumn("blk", blockKey(col("name")))
    val a = names.select(col("name").as("name_a"), col("support").as("n_a"),
      col("blk"))
    val b = names.select(col("name").as("name_b"), col("support").as("n_b"),
      col("blk"))
    a.join(b, Seq("blk"))
      .where(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .where(col("dist") <= maxDist)
      .select("name_a", "name_b", "dist", "n_a", "n_b")
  }
}
