package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ops.{Dedup, TextOps}

/** Incremental (streaming) MinHash-LSH near-dup detection: as documents
  * arrive, emit candidate pairs against everything previously seen —
  * the online form of `Dedup.minhashCandidates` for dedup-at-ingest.
  *
  * Streaming constraint drives the shape: the batch signature path is
  * a groupBy (a streaming aggregation, which can't feed a second
  * stateful operator), so signatures here are computed PER ROW with
  * array HOFs (`array_min` over transformed shingles — same md5
  * permutation, provably identical output, no shuffle), banding is the
  * same stateless explode, and the only stateful operator is bucket
  * membership: state(band bucket) = doc ids seen, new arrivals emit a
  * pair per existing member. State per bucket is capped (`maxBucket`)
  * — a hot bucket stops admitting members rather than growing without
  * bound; at LSH band sizes a legitimate bucket is tiny, so the cap
  * only bites degenerate content.
  *
  * The same pair can surface from multiple bands (no cross-bucket
  * dedup without a second stateful stage); the downstream exact-verify
  * join (`Dedup.jaccard`) is idempotent, so duplicates cost work, not
  * correctness.
  */
object StreamingDedup {

  final case class BandedDoc(bucket: String, docId: Long)
  final case class CandPair(a: Long, b: Long)

  /** Per-row minhash signatures — value-identical to
    * `Dedup.minhashSignatures` (asserted in spec) but expressed as
    * array HOFs so it stays a stateless projection: one md5-derived
    * 48-bit hash per shingle, then the same affine permutations. */
  def rowwiseSignatures(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int, numHashes: Int): DataFrame = {
    val ab = Dedup.minhashAB(numHashes)
    val hs = transform(TextOps.shingles(col(textCol), shingleN),
      s => Dedup.shingleHash(s))
    val sig = array((0 until numHashes).map { i =>
      val (a, b) = ab(i)
      array_min(transform(hs, h => (h * a + b) % Dedup.MinhashP))
        .cast("string")
    }: _*)
    // a shingle-less doc (empty/whitespace text) has an all-null
    // signature; the batch path emits no row for it (nothing to
    // explode), so drop it here too — otherwise concat_ws would
    // collapse every such doc into one shared band bucket
    df.select(col(idCol), sig.as("sig"))
      .where(element_at(col("sig"), 1).isNotNull)
  }

  /** Stateless banding on top of the row-wise signatures: one
    * `band#band_key -> doc` row per band. */
  def bandedDocs(docs: DataFrame, idCol: String, textCol: String,
                 shingleN: Int = 3, numHashes: Int = 8,
                 rowsPerBand: Int = 2): Dataset[BandedDoc] = {
    import docs.sparkSession.implicits._
    Dedup.lshBands(
        rowwiseSignatures(docs, idCol, textCol, shingleN, numHashes),
        idCol, numHashes, rowsPerBand)
      .select(concat_ws("#", col("band"), col("band_key")).as("bucket"),
        col(idCol).cast("long").as("docId"))
      .as[BandedDoc]
  }

  /** The stateful stage: per LSH bucket, remember members and emit a
    * candidate pair for every (new arrival, prior member). */
  def candidatePairs(bands: Dataset[BandedDoc],
                     maxBucket: Int = 64): Dataset[CandPair] = {
    import bands.sparkSession.implicits._
    bands.groupByKey(_.bucket)
      .flatMapGroupsWithState[Seq[Long], CandPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, it, state: GroupState[Seq[Long]]) =>
          val seen = state.getOption.getOrElse(Seq.empty)
          val incoming = it.map(_.docId).toVector.distinct.sorted
            .filterNot(seen.contains)
          val admitted = incoming.take(math.max(maxBucket - seen.size, 0))
          if (admitted.nonEmpty) state.update(seen ++ admitted)
          val pairs = for {
            n <- admitted
            o <- seen ++ admitted.takeWhile(_ < n)
          } yield CandPair(math.min(o, n), math.max(o, n))
          pairs.iterator
      }
  }

  /** Full streaming near-dup pipeline: documents stream in, candidate
    * pairs stream out. */
  def nearDupCandidates(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, numHashes: Int = 8,
                        rowsPerBand: Int = 2,
                        maxBucket: Int = 64): Dataset[CandPair] =
    candidatePairs(
      bandedDocs(docs, idCol, textCol, shingleN, numHashes, rowsPerBand),
      maxBucket)

  /** Streaming perceptual near-dup: images stream in, candidate pairs
    * stream out — the IMAGE arm of dedup-at-ingest, sharing the text
    * path's stateful bucket-membership operator. The stateless stage
    * decodes + pools + dHashes per row (mapPartitions, no shuffle —
    * [[graft.ops.Multimodal.perceptualHashes]]) and bands the 64 bits
    * as four 16-bit buckets, exactly like the batch
    * `perceptualNearDup`; candidates are verified downstream by
    * Hamming distance (idempotent), so multi-band duplicates cost
    * work, not correctness. The bucket cap plays the batch path's
    * hot-bucket guard (flat images all hash alike). */
  def perceptualCandidates(media: DataFrame,
                           maxBucket: Int = 64): Dataset[CandPair] = {
    val spark = media.sparkSession
    import spark.implicits._
    val bands = graft.ops.Multimodal.perceptualHashes(spark, media)
      .flatMap { h =>
        Seq(
          BandedDoc(s"ph0#${h.hash_hi >>> 16}", h.media_id),
          BandedDoc(s"ph1#${h.hash_hi & 0xFFFF}", h.media_id),
          BandedDoc(s"ph2#${h.hash_lo >>> 16}", h.media_id),
          BandedDoc(s"ph3#${h.hash_lo & 0xFFFF}", h.media_id))
      }
    candidatePairs(bands, maxBucket)
  }

  /** Durable variant: stream documents into the PERSISTED band index
    * (`Dedup.indexBands` lake table) via foreachBatch — each
    * micro-batch reports its candidates against everything indexed
    * before it plus its own intra-batch pairs (appended to
    * `<table>_pairs`), then appends its own bands to the index.
    * Unlike [[nearDupCandidates]]' in-memory operator state, the
    * index survives restarts and is shared with the batch path
    * (`Dedup.batchCandidates`) — arrival cost stays O(batch).
    *
    * The batch's signatures are computed ONCE (localCheckpoint) and
    * shared by all three consumers. Restart safety: foreachBatch is
    * at-least-once, so every appended row is tagged `__batch_id` and
    * each table independently skips a batch it has already committed
    * (its own high-water mark) — a crash between the pairs append
    * and the index append resumes exactly where it stopped instead
    * of double-appending.
    *
    * `sourceSchema` is required when the landing dir may still be
    * empty at start (schema inference on an empty dir throws — same
    * deploy-order contract as StreamingIngest.start). */
  def startBandIndexIngest(spark: org.apache.spark.sql.SparkSession,
                           sourceDir: String,
                           store: graft.lake.TableStore, table: String,
                           idCol: String, textCol: String,
                           checkpointDir: Option[String] = None,
                           sourceSchema: Option[org.apache.spark.sql.types.StructType] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = sourceSchema.getOrElse(spark.read.parquet(sourceDir).schema)
    val writer = spark.readStream.schema(schema).parquet(sourceDir)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // one signature pass per batch, shared by intra pairs,
          // index pairs, and the index append
          val bands = Dedup.bandsOf(batch, idCol, textCol).localCheckpoint()
          val intra = Dedup.pairsFromBands(bands, idCol)
          val pairs =
            if (store.exists(table))
              Dedup.indexCandidates(store, table, bands, idCol)
                .unionByName(intra)
            else intra
          appendBatchOnce(store, s"${table}_pairs", batchId, pairs)
          appendBatchOnce(store, table, batchId, bands)
        }
      }
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .start()
  }

  /** Idempotent micro-batch append: rows are tagged `__batch_id` and
    * a batch the table has already committed is skipped — the
    * exactly-once guard over foreachBatch's at-least-once replays. */
  private[streaming] def appendBatchOnce(store: graft.lake.TableStore,
                                         table: String, batchId: Long,
                                         df: DataFrame): Unit = {
    val alreadyCommitted = store.exists(table) && {
      val t = store.read(table)
      t.columns.contains("__batch_id") &&
        !t.where(col("__batch_id") === batchId).isEmpty
    }
    if (!alreadyCommitted) {
      val tagged = df.withColumn("__batch_id", lit(batchId))
      if (store.exists(table)) store.append(table, tagged)
      else store.create(table, tagged)
    }
  }
}
