package graft.ops

import graft.lake.TableStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted IVF (inverted-file) ANN index over an embedding corpus,
  * stored IN the table store — train once, serve many. The per-query
  * [[Similarity.ivfTopK]] re-trains and re-assigns the corpus on every
  * call; at 100 TB the index build is the expensive pass and queries
  * must not repeat it. Build writes two tables:
  *
  *   - `<name>_centroids` — the (cent_id, cvec) k-means result, tiny
  *     (nlist × dim), broadcast at search time;
  *   - `<name>_lists` — the inverted lists (cent_id, id, vec),
  *     hive-PARTITIONED by cent_id.
  *
  * Search assigns each probe its `nprobe` closest centroids (broadcast
  * — no corpus touch), then reads ONLY those lists: the probed
  * cent_ids land as a LITERAL IN on the lists table's partition
  * column, so partition pruning drops every unprobed list directory
  * before a file opens — the store's scan-avoidance lever applied to
  * ANN. The probed-id set is ≤ nlist by construction, so the
  * driver-side collect is bounded metadata, never data-sized.
  *
  * Determinism mirrors [[Similarity.ivfSearch]] (4-dp rounded cosines,
  * cent_id/vid tiebreaks), so a search against a freshly built index
  * equals `ivfSearch` given the same centroids — the parity a DuckDB
  * oracle holding the centroid literals re-proves per run. Rebuild
  * overwrites both tables atomically (each commit is atomic; a reader
  * racing a rebuild sees old or new lists, never a mix of list
  * versions within one table).
  */
object VectorIndex {

  def centroidsTable(name: String): String = s"${name}_centroids"
  def listsTable(name: String): String = s"${name}_lists"

  /** Train k-means over `corpus` and persist centroids + inverted
    * lists under `name`. O(corpus) — one assignment pass after
    * training; re-running overwrites (index rebuild). */
  def buildIvfIndex(store: TableStore, name: String, corpus: DataFrame,
                    nlist: Int = 16, kmeansIters: Int = 2,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): Unit = {
    val cents = Similarity.kmeansCentroids(corpus, nlist, kmeansIters,
      idCol, vecCol)
    val lists = Similarity.assignClusters(corpus, cents, idCol, vecCol)
      .select(col("cent_id"), col(idCol), col(vecCol))
    val ct = centroidsTable(name)
    val lt = listsTable(name)
    if (store.exists(ct)) store.overwrite(ct, cents)
    else store.create(ct, cents)
    if (store.exists(lt)) store.overwrite(lt, lists, preserveLayout = true)
    else store.create(lt, lists, partitionBy = Seq("cent_id"))
  }

  /** ANN top-k for `probes` against the persisted index — never
    * touches the corpus table, reads only the probed lists. Result
    * shape matches [[Similarity.ivfSearch]]: (qid, vid, cos, rnk),
    * rnk ≤ k per probe. */
  def searchIvfIndex(store: TableStore, name: String, probes: DataFrame,
                     k: Int, nprobe: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(probes.sparkSession)
    val cents = store.read(centroidsTable(name))
    val pa = Similarity.assignTopClusters(probes, cents, nprobe,
        idCol, vecCol)
      .select(col(idCol).as("qid"), col(vecCol).as("qvec"), col("cent_id"))
    val lists0 = store.read(listsTable(name))
    // the hive partition column's read-back type may be narrower than
    // the centroid ids' (directory-name inference); align BOTH the IN
    // literals and the join key to it, or the cast around the
    // partition attribute defeats static pruning
    val dt = lists0.schema("cent_id").dataType
    val needed = pa.select(col("cent_id").cast(dt)).distinct()
      .collect().map(_.get(0)).toIndexedSeq
    if (needed.isEmpty)
      return pa.select(col("qid"), col("qid").as("vid"),
        lit(0.0).as("cos"), lit(0).as("rnk")).where(lit(false))
    val lists = lists0.where(col("cent_id").isin(needed: _*))
      .select(col("cent_id"), col(idCol).as("vid"), col(vecCol).as("vvec"))
    val scored = lists
      .join(pa.withColumn("cent_id", col("cent_id").cast(dt)), Seq("cent_id"))
      .where(col("qid") =!= col("vid"))
      .select(col("qid"), col("vid"),
        round(Similarity.cosine(col("qvec"), col("vvec")), 4).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vid"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }
}
