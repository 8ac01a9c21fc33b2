package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Connected-components clustering and sequence packing — the two
  * round-3 pipeline additions with sequential-looking semantics that
  * must stay shuffle-parallel. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents labels a path, a triangle, and a pair") {
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),       // path 1-2-3-4
      (10L, 11L), (11L, 12L), (10L, 12L), // triangle
      (21L, 20L))                         // lone pair, reversed order
      .toDF("a", "b")
    val got = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents converges on a long path within the bound") {
    val edges = (1 until 15).map(i => (i.toLong, i + 1L)).toDF("a", "b")
    val labels = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect()
    assert(labels.length == 15 && labels.forall(_._2 == 1L))
  }

  test("the distributed loop throws instead of returning partial labels") {
    // decimal ids sit outside the driver fold's supported orderings,
    // so this pins the DISTRIBUTED min-label loop's convergence guard
    // (bounded long-id graphs now union-find on the driver and always
    // converge)
    val edges = (1 until 10).map(i => (i.toLong, i + 1L)).toDF("a", "b")
      .select(col("a").cast("decimal(10,0)").as("a"),
        col("b").cast("decimal(10,0)").as("b"))
    intercept[IllegalStateException] {
      Dedup.connectedComponents(edges, maxIters = 2)
    }
  }

  test("driver union-find equals the distributed loop on the same graph") {
    val raw = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (21L, 20L), (30L, 31L), (30L, 32L), (5L, 2L))
    val edges = raw.toDF("a", "b")
    val driver = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    // decimal ids force the distributed loop; cast labels back
    val dist = Dedup.connectedComponents(
        edges.select(col("a").cast("decimal(10,0)").as("a"),
          col("b").cast("decimal(10,0)").as("b")))
      .select(col("id").cast("long"), col("component").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(driver == dist)
  }

  test("star contraction matches min-label CC on a branchy graph") {
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),       // path 1-2-3-4
      (10L, 11L), (11L, 12L), (10L, 12L), // triangle
      (21L, 20L),                         // lone pair
      (30L, 31L), (30L, 32L), (30L, 33L), (33L, 34L), // star + tail
      (40L, 40L))                         // self-loop-only node
      .toDF("a", "b")
    val minLabel = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    val star = Dedup.connectedComponentsStar(edges)
      .as[(Long, Long)].collect().toMap
    assert(star == minLabel)
  }

  test("star contraction converges on a chain deeper than the min-label bound") {
    // a 120-node path has diameter 119: the DISTRIBUTED min-label
    // loop's default 20-round bound throws (decimal ids force it —
    // bounded long-id graphs union-find on the driver and converge
    // regardless of diameter); star contraction needs O(log n) rounds
    val chain = (1 until 120).map(i => (i.toLong, i + 1L)).toDF("a", "b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain.select(
        col("a").cast("decimal(10,0)").as("a"),
        col("b").cast("decimal(10,0)").as("b")))
    }
    // the driver fold labels the same deep chain fine
    assert(Dedup.connectedComponents(chain)
      .as[(Long, Long)].collect().forall(_._2 == 1L))
    val labels = Dedup.connectedComponentsStar(chain)
      .as[(Long, Long)].collect()
    assert(labels.length == 120 && labels.forall(_._2 == 1L))
    assert(labels.map(_._1).sorted.toSeq == (1L to 120L))
  }

  test("packSequences assigns packs by concatenated start offset") {
    val docs = Seq(
      (1L, "x", "a b c"),   // start 0  -> pack 0
      (2L, "x", "d e f"),   // start 3  -> pack 0
      (3L, "x", "g h"),     // start 6  -> pack 1 (budget 5)
      (4L, "y", "i j k l m n"), // own stream: start 0 -> pack 0
      (5L, "y", "o"))       // start 6 -> pack 1
      .toDF("doc_id", "lang", "text")
    val got = TextOps.packSequences(docs, "doc_id", "text",
        budget = 5, streamCols = Seq(col("lang")))
      .select("doc_id", "start_off", "pack_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 0L, 0L), (2L, 3L, 0L), (3L, 6L, 1L),
      (4L, 0L, 0L), (5L, 6L, 1L)))
  }

  test("hot-bucket star emission thins pairs but preserves components") {
    // one hot bucket (5 members) + one small bucket (2 members)
    val bands = (Seq.tabulate(5)(i => (i.toLong, 0, "hot")) ++
      Seq((10L, 0, "cold"), (11L, 0, "cold")))
      .toDF("doc_id", "band", "band_key")
    val exact = Dedup.pairsFromBands(bands, "doc_id")
    assert(exact.count() == 10 + 1) // C(5,2) + 1
    val starred = Dedup.pairsFromBands(bands, "doc_id", starAbove = 3)
    val got = starred.as[(Long, Long)].collect().sortBy(identity).toSeq
    // hot bucket: 4 star pairs around min id 0; cold bucket unchanged
    assert(got == Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (10L, 11L)))
    // connectivity identical: same components from either pair set
    val cExact = Dedup.connectedComponents(exact.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    val cStar = Dedup.connectedComponents(starred.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(cExact == cStar)
  }
}
