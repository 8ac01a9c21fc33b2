package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed map-side top-k aggregation (SURVEY §7.4's reserved
  * `Aggregator`): keeps a bounded buffer of the k best (score, id)
  * pairs per group. Partial aggregation runs map-side, so the shuffle
  * carries at most k rows per (group, partition) instead of the full
  * scored cross product — the difference between shipping
  * O(probes x corpus) and O(probes x k x partitions) at 100 TB.
  *
  * Ordering: score DESC, id ASC — identical to the window-rank
  * formulation (`row_number over (order by cos desc, vid)`), so both
  * paths return the same rows.
  */
object TopK {

  final case class Scored(group: Long, id: Long, score: Double)

  /** Buffer = sorted (score desc, id asc) list, at most k entries. */
  private final class TopKAgg(k: Int)
      extends Aggregator[Scored, List[(Double, Long)], Seq[(Double, Long)]] {
    private val ord: Ordering[(Double, Long)] =
      Ordering.by { case (s, id) => (-s, id) }
    override def zero: List[(Double, Long)] = Nil
    override def reduce(b: List[(Double, Long)], a: Scored): List[(Double, Long)] =
      insert(b, (a.score, a.id))
    override def merge(x: List[(Double, Long)], y: List[(Double, Long)]): List[(Double, Long)] =
      y.foldLeft(x)(insert)
    private def insert(b: List[(Double, Long)], e: (Double, Long)): List[(Double, Long)] = {
      val (before, after) = b.span(ord.lt(_, e))
      val merged = before ::: (e :: after)
      if (merged.length > k) merged.take(k) else merged
    }
    override def finish(b: List[(Double, Long)]): Seq[(Double, Long)] = b
    override def bufferEncoder: Encoder[List[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** Top-k rows per group from (group, id, score) — map-side partial.
    * Returns (group, rnk, id, score) like the window formulation. */
  def topKPerGroup(spark: SparkSession, scored: DataFrame, k: Int,
                   groupCol: String = "qid", idCol: String = "vid",
                   scoreCol: String = "cos"): DataFrame = {
    import spark.implicits._
    val ds = scored.select(col(groupCol).as("group"), col(idCol).as("id"),
      col(scoreCol).as("score")).as[Scored]
    val agg = new TopKAgg(k).toColumn
    ds.groupByKey(_.group)
      .agg(agg.name("topk"))
      .flatMap { case (g, top) =>
        top.zipWithIndex.map { case ((s, id), i) => (g, i + 1, id, s) }
      }
      .toDF(groupCol, "rnk", idCol, scoreCol)
  }
}
