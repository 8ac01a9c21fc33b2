package graft.ops

import graft.SparkSpec
import graft.lake.TableStore
import org.apache.spark.sql.functions._

/** The persisted-band-index arrival path: corpus signatures computed
  * once, new batches join the stored index. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private val corpus = docs(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "completely different content about spark engines and shuffles here"),
    (3L, "another unrelated document discussing parquet file formats today"))

  test("a batch near-dup of an indexed doc is found without re-indexing the corpus") {
    val store = new TableStore(spark, tmpDir("bandidx"))
    Dedup.indexBands(store, "idx", corpus, "doc_id", "text")
    val v0 = store.currentVersion("idx").get
    // batch doc 10 is a near-copy of corpus doc 1; doc 11 is novel
    val batch = docs(
      (10L, "the quick brown fox jumps over the lazy dog near the river shore"),
      (11L, "nothing in common with anything indexed so far at all honestly"))
    val pairs = Dedup.batchCandidates(store, "idx", batch, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 10L)), s"missed the near-copy: $pairs")
    assert(!pairs.exists(_._2 == 11L), s"novel doc paired: $pairs")
    // candidate generation read the index, it did not rewrite it
    assert(store.currentVersion("idx").contains(v0))
  }

  test("indexing a second batch appends bands instead of recomputing") {
    val store = new TableStore(spark, tmpDir("bandidx"))
    Dedup.indexBands(store, "idx", corpus, "doc_id", "text")
    val before = store.read("idx").count()
    Dedup.indexBands(store, "idx",
      docs((20L, "fresh arrival text joining the permanent signature index")),
      "doc_id", "text")
    assert(store.currentVersion("idx").contains(1L)) // append, new version
    assert(store.read("idx").count() > before)
    // earlier docs' bands are carried by reference, still queryable
    assert(store.read("idx").where(col("doc_id") === 1L).count() > 0)
  }
}
