package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def chunkHashes(text: String): Set[String] =
    TextOps.cdcChunks(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", divisor = 8)
      .select("chunk_hash").as[String].collect().toSet

  test("two docs with identical text chunk identically (per-doc isolation)") {
    val t = (1 to 100).map(i => s"tok${i * 37 % 91}").mkString(" ")
    // one frame, two doc ids, same text: the per-doc window must give
    // both the same chunk-hash multiset
    val rows = TextOps.cdcChunks(
        Seq((1L, t), (2L, t)).toDF("doc_id", "text"),
        "doc_id", "text", divisor = 8)
      .select("doc_id", "chunk_hash")
      .as[(Long, String)].collect().toSeq
    def multiset(doc: Long) = rows.filter(_._1 == doc).map(_._2)
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(multiset(1L).nonEmpty)
    assert(multiset(1L) == multiset(2L))
  }

  test("a prefix insertion only disturbs chunks before the next boundary") {
    // content-defined property: boundaries move WITH the content, so
    // everything after the first boundary past the edit re-aligns
    val base = (1 to 200).map(i => s"tok${i * 37 % 91}").mkString(" ")
    val edited = "inserted words here " + base
    val a = chunkHashes(base)
    val b = chunkHashes(edited)
    val shared = a.intersect(b).size.toDouble
    assert(shared / a.size > 0.5,
      s"only $shared of ${a.size} chunks survived a prefix edit")
  }
}

