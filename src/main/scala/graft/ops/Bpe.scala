package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic byte-pair encoding (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", arXiv:1508.07909) —
  * the real token-budget counter, replacing regex-only approximations:
  * merges TRAIN driver-side from the corpus-wide (pre-token,
  * frequency) aggregate, capped to the top-|V| entries by frequency;
  * application is a distributed pipeline that touches the
  * VOCABULARY, never the corpus, row-by-row:
  *
  *   corpus → pre-tokenize (regex, codegen'd) → explode →
  *   count per distinct pre-token (shuffle on the token — the only
  *   corpus-sized shuffle, map-side combined) → segment each DISTINCT
  *   token once (pure Scala over |V| rows) → broadcast piece counts
  *   back → aggregate.
  *
  * At 100 TB the distinct pre-token vocabulary is millions of rows
  * where the corpus is trillions — segmentation cost is O(|V| · len²),
  * independent of corpus size, and the merge table broadcasts as a
  * few hundred KB. Ties in training break lexicographically, so the
  * same sample always yields the same merges on any cluster. */
object Bpe {

  /** End-of-word sentinel appended to every pre-token before char
    * split (the classic </w>, one char so lengths stay obvious). */
  private val Eow = "\u0017"

  /** Train `numMerges` BPE merges from (word, frequency) pairs — pure
    * driver-side function. Deterministic: the best pair each round is
    * max by (count, then the lexicographically LARGEST pair —
    * any total order works; this one is what the code does). */
  def train(words: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var seqs: Map[Vector[String], Long] = words
      .groupMapReduce(w => w._1.map(_.toString).toVector :+ Eow)(_._2)(_ + _)
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      seqs.foreach { case (syms, n) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + n
          j += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // max by (count, then pair) — count decides, the
        // lexicographically largest pair breaks ties: any TOTAL order
        // works, it just has to be the same one everywhere
        val (pair, cnt) = pairCounts.toSeq
          .maxBy { case ((a, b), n) => (n, a, b) }
        if (cnt < 2) done = true // nothing repeats: merging is noise
        else {
          merges += pair
          seqs = seqs.map { case (syms, n) => (mergeOnce(syms, pair), n) }
        }
      }
      i += 1
    }
    merges.result()
  }

  private def mergeOnce(syms: Vector[String],
                        pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == pair._1 && syms(j + 1) == pair._2) {
        out += syms(j) + syms(j + 1)
        j += 2
      } else {
        out += syms(j)
        j += 1
      }
    }
    out.result()
  }

  /** Segment one word under ranked merges (lower rank = applied
    * first) — pure, the per-vocab-entry worker. */
  def segment(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms = word.map(_.toString).toVector :+ Eow
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(j), syms(j + 1)) }
        j += 1
      }
      if (bestPair == null) continue = false
      else syms = mergeOnce(syms, bestPair)
    }
    // a sentinel that never merged stays a standalone "piece" — drop
    // it (it carries no text); a merged sentinel rides inside its
    // piece and counts with it (standard </w> accounting)
    syms.filterNot(_ == Eow)
  }

  /** Train from the FULL corpus's (pre-token, frequency) aggregate —
    * not a document sample, so the merges reflect the real corpus
    * distribution. One distributed aggregate (shuffle on the token,
    * map-side combined) and a top-`maxWords` cap by (frequency desc,
    * token asc) bound the driver's training input to |V| entries.
    * The cap is an APPROXIMATION when it binds: the dropped tail's
    * tokens are individually rare, but a character pair spread
    * across many of them could in aggregate outvote a head pair —
    * standard head-truncated BPE practice (every production
    * tokenizer trains on a bounded vocabulary), not exact full-vocab
    * training; raise `maxWords` when the distinct-pre-token count is
    * near it and exactness matters. Deterministic on any cluster
    * layout either way: the aggregate is partition-order-free and
    * the cap's ordering is total. */
  def trainFromCorpus(df: DataFrame, textCol: String,
                      numMerges: Int, maxWords: Int = 50000): Seq[(String, String)] = {
    val words = df
      .select(explode(TextOps.bpeTokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(maxWords)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    train(words, numMerges)
  }

  /** The FULL (distinct pre-token, count) aggregate, collected — ONE
    * corpus pass that serves training AND segmentation: the budget /
    * piece-id queries previously paid a distributed distinct+UDF pass
    * per consumer (train, vocabPieces, vocabSegments) over the same
    * token set; with the counts in hand, training picks its capped
    * head driver-side ([[trainFromWordCounts]]) and segmentation maps
    * `segment` over the SAME array. Driver-bounded by |V| (distinct
    * pre-tokens), which these callers collect anyway to embed the
    * vocabulary in their oracles. */
  def tokenCounts(df: DataFrame, textCol: String): Array[(String, Long)] =
    df.select(explode(TextOps.bpeTokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))

  /** [[trainFromCorpus]]'s tail over precollected counts — identical
    * word ranking (count desc, then token in unsigned UTF-8 byte
    * order, Spark's binary string sort), identical cap. */
  def trainFromWordCounts(counts: Seq[(String, Long)], numMerges: Int,
                          maxWords: Int = 50000): Seq[(String, String)] = {
    def utf8Key(s: String): String =
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => (b & 0xff).toChar).mkString
    val words = counts.sortBy { case (tk, n) => (-n, utf8Key(tk)) }
      .take(maxWords)
    train(words, numMerges)
  }

  /** (distinct pre-token, piece count) under `merges` for every
    * pre-token in the corpus — the broadcastable segmentation map.
    * One corpus-sized shuffle (the token distinct, map-side combined);
    * segmentation itself runs over |V| rows only. */
  def vocabPieces(df: DataFrame, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val ranks = merges.zipWithIndex.toMap
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(ranks)
    val nPieces = udf((tok: String) => segment(tok, bc.value).size)
    df.select(explode(TextOps.bpeTokens(col(textCol))).as("tok"))
      .distinct()
      .withColumn("pieces", nPieces(col("tok")).cast("long"))
  }

  /** (distinct pre-token, piece STRINGS) under `merges` — the full
    * segmentation map behind [[vocabPieces]]'s counts and
    * [[docPieceIds]]'s id sequences. Same shape: one corpus-sized
    * distinct, segmentation over |V| rows only. */
  def vocabSegments(df: DataFrame, textCol: String,
                    merges: Seq[(String, String)]): DataFrame = {
    val ranks = merges.zipWithIndex.toMap
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(ranks)
    val segUdf = udf((tok: String) => segment(tok, bc.value))
    df.select(explode(TextOps.bpeTokens(col(textCol))).as("tok"))
      .distinct()
      .withColumn("pieces", segUdf(col("tok")))
  }

  /** Deterministic piece vocabulary: every piece the corpus's
    * segmentations emit, id-assigned in lexicographic piece order.
    * Driver-side is safe by construction: a piece is either a base
    * character or the product of one merge rule, so |pieces| <=
    * |alphabet| + |merges| — hundreds, not corpus-sized. */
  def pieceIdMap(df: DataFrame, textCol: String,
                 merges: Seq[(String, String)]): Seq[(String, Int)] =
    vocabSegments(df, textCol, merges)
      .select(explode(col("pieces")).as("p")).distinct()
      .orderBy("p")
      .collect().map(_.getString(0)).zipWithIndex.toSeq

  /** Per-document piece-ID sequences — the materialization step a
    * pretraining pipeline actually ships (ids, not counts). Document
    * order is preserved: pre-tokens explode WITH POSITION, join the
    * broadcast |V|-row segmentation (corpus rows never carry merge
    * work), and each doc re-assembles by position. Empty /
    * whitespace-only docs keep a row with an empty sequence. One
    * corpus shuffle (the per-doc re-assembly) — at 100 TB that is
    * the floor for any order-preserving tokenization. */
  def docPieceIds(df: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String)],
                  pieceIds: Map[String, Int]): DataFrame = {
    val ranks = merges.zipWithIndex.toMap
    val spark = df.sparkSession
    val bcR = spark.sparkContext.broadcast(ranks)
    val bcP = spark.sparkContext.broadcast(pieceIds)
    val idsUdf = udf((tok: String) => segment(tok, bcR.value)
      .map(p => bcP.value.getOrElse(p,
        throw new IllegalArgumentException(s"piece '$p' not in vocab"))))
    val segs = df.select(explode(TextOps.bpeTokens(col(textCol))).as("tok"))
      .distinct()
      .withColumn("ids", idsUdf(col("tok")))
    assembleFromSegs(df, idCol, textCol, segs)
  }

  /** [[docPieceIds]] with the (pre-token → piece ids) segmentation
    * supplied precomputed — a caller that already collected
    * [[vocabSegments]] (e.g. to emit an export manifest) skips the
    * corpus-sized distinct+segment pass and pays only the one
    * assembly shuffle. */
  def docPieceIdsPreseg(df: DataFrame, idCol: String, textCol: String,
                        seg: Seq[(String, Seq[Int])]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    assembleFromSegs(df, idCol, textCol, seg.toDF("tok", "ids"))
  }

  /** Driver-side tail of [[pieceIdMap]] over an already-collected
    * segmentation — same id assignment (lexicographic in unsigned
    * UTF-8 byte order, matching Spark's binary string sort) without
    * pieceIdMap's corpus scan. */
  def pieceIdsFromSegments(seg: Seq[(String, Seq[String])]): Seq[(String, Int)] =
    seg.flatMap(_._2).distinct
      .sortBy(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => (b & 0xff).toChar).mkString)
      .zipWithIndex

  /** Order-preserving re-assembly shared by the docPieceIds variants:
    * pre-tokens explode WITH POSITION, join the broadcast |V|-row
    * segmentation, and each doc re-assembles by position. Empty /
    * whitespace-only docs keep a row with an empty sequence. */
  private def assembleFromSegs(df: DataFrame, idCol: String,
                               textCol: String,
                               segs: DataFrame): DataFrame = {
    val toks = df.select(col(idCol),
      posexplode(TextOps.bpeTokens(col(textCol))).as(Seq("pos", "tok")))
    val asm = toks.join(broadcast(segs), Seq("tok"))
      .groupBy(idCol)
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("ids")))),
        x => x.getField("ids"))).as("piece_ids"))
    df.select(col(idCol)).join(asm, Seq(idCol), "left")
      .withColumn("piece_ids",
        coalesce(col("piece_ids"), typedLit(Array.empty[Int])))
  }

  /** Real-tokenizer budget per group: docs, total pre-tokens, and
    * total BPE pieces. The per-doc piece count joins each doc's
    * exploded pre-tokens to the broadcast vocabulary map — corpus
    * rows never carry segmentation work, only a hash join against
    * |V|. The group universe comes from a LEFT join off the doc
    * count, so a group whose documents yield zero pre-tokens
    * (empty/whitespace-only text) still reports, at 0 — an inner
    * join off the explode would silently drop it. */
  def tokenBudget(df: DataFrame, textCol: String, groupCol: String,
                  merges: Seq[(String, String)]): DataFrame =
    tokenBudgetWith(df, textCol, groupCol,
      vocabPieces(df, textCol, merges).select("tok", "pieces"))

  /** [[tokenBudget]] with the (tok, pieces) vocabulary supplied — a
    * caller that already collected [[tokenCounts]] and segmented
    * driver-side passes a local frame and skips the corpus-sized
    * distinct+segment pass entirely. */
  def tokenBudgetWith(df: DataFrame, textCol: String, groupCol: String,
                      vocab: DataFrame): DataFrame = {
    val toks = df.select(col(groupCol),
        explode(TextOps.bpeTokens(col(textCol))).as("tok"))
    val agg = toks.join(broadcast(vocab), Seq("tok"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("pre_tokens"),
        sum("pieces").as("bpe_pieces"))
    // null-safe join key: a NULL group must pick up ITS aggregate,
    // not get na.fill'ed to 0 while its docs are counted (USING-join
    // equality never matches NULL to NULL). The agg side's key is
    // renamed first — both frames descend from df, and drop(Column)
    // on the ambiguous shared lineage removes the wrong one.
    val aggR = agg.withColumnRenamed(groupCol, "__bpe_g")
    val docs = df.groupBy(groupCol).agg(count(lit(1)).as("docs"))
    docs.join(aggR, col(groupCol) <=> col("__bpe_g"), "left")
      .drop("__bpe_g")
      .na.fill(0L, Seq("pre_tokens", "bpe_pieces"))
  }
}
