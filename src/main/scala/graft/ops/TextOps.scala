package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines (north-star
  * extension, BASELINE.json): tokenization, quality scoring, language-ID
  * heuristics, fingerprinting. All built from codegen'd native functions
  * — no UDFs — so they stay inside whole-stage codegen at 100 TB.
  *
  * Fixture `documents.text` is single-space-separated lowercase tokens,
  * so tokenization is an exact `split`; on real corpora swap the
  * delimiter regex.
  */
object TextOps {

  /** Whitespace tokenizer. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Type-token ratio — a standard lexical-diversity quality signal. */
  def typeTokenRatio(text: Column): Column =
    round(distinctTokenCount(text).cast("double") / tokenCount(text), 4)

  /** Mean token length (chars excluding the single separators). */
  def avgTokenLen(text: Column): Column =
    round((length(text) - (tokenCount(text) - 1)).cast("double") / tokenCount(text), 4)

  /** Stopword-hit count against a fixed vocabulary — the building block
    * of both quality scoring and n-gram language ID. */
  def stopwordHits(text: Column, stopwords: Seq[String]): Column =
    size(array_intersect(array_distinct(tokens(text)),
      array(stopwords.map(lit): _*)))

  /** Heuristic language ID: vote by stopword-list hits, 'unk' when no
    * list scores. Deterministic, SQL-expressible (oracle-checkable). */
  def langId(text: Column, lists: Seq[(String, Seq[String])]): Column = {
    val scored = lists.map { case (lang, words) => (lang, stopwordHits(text, words)) }
    // argmax by hits, first-in-list-order wins ties (strict > below)
    scored.tail.foldLeft((lit(scored.head._1), scored.head._2)) {
      case ((bestLang, bestHits), (lang, hits)) =>
        (when(hits > bestHits, lang).otherwise(bestLang),
          greatest(bestHits, hits))
    } match {
      case (lang, hits) => when(hits > 0, lang).otherwise("unk")
    }
  }

  /** BPE-ish pre-tokenization (GPT-2-style pattern simplified to the
    * classes that matter for counting: contractions, letter runs, digit
    * runs, other-symbol runs, each with optional leading space). The
    * fixture text is plain lowercase words, but the operator is the
    * real one a token-budget pipeline runs before byte-pair merges. */
  val bpePattern: String = "'[a-z]+| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ']+"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpePattern), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** Sliding-window chunking with overlap — the retrieval/context-prep
    * counterpart of content-defined chunking: fixed `width`-token
    * windows every `stride` tokens (stride < width ⇒ overlapping
    * chunks). Pure per-row array expressions (sequence → slice →
    * explode): embarrassingly parallel, no shuffle at all until the
    * caller aggregates. Emits one row per (doc, chunk): chunk_idx,
    * chunk start offset, text and token count of the chunk. Every doc
    * emits at least one chunk (a short doc is its own chunk). */
  def slidingChunks(df: DataFrame, idCol: String, textCol: String,
                    width: Int, stride: Int): DataFrame = {
    require(width > 0 && stride > 0, "width and stride must be positive")
    val toks = tokens(col(textCol))
    // number of windows: 1 + ceil(max(len - width, 0) / stride), via
    // integer arithmetic on the token count
    val extra = greatest(size(toks) - width, lit(0))
    val nChunks = lit(1) + (extra + (stride - 1)).cast("long") / lit(stride)
    val chunks = transform(
      sequence(lit(0L), nChunks.cast("long") - 1),
      k => struct(k.as("chunk_idx"),
        (k * stride).as("chunk_off"),
        concat_ws(" ", slice(toks, (k * stride + 1).cast("int"), lit(width)))
          .as("chunk_text")))
    df.select(col(idCol), explode(chunks).as("c"))
      .select(col(idCol),
        col("c.chunk_idx").cast("long").as("chunk_idx"),
        col("c.chunk_off").cast("long").as("chunk_off"),
        col("c.chunk_text").as("chunk_text"))
      .withColumn("chunk_tokens", tokenCount(col("chunk_text")).cast("long"))
  }

  /** Sequence packing by stream concatenation — the pass that turns a
    * ragged document corpus into fixed-`budget`-token training
    * examples (GPT-style: documents laid end-to-end, cut every
    * `budget` tokens). Documents are concatenated per stream in
    * `idCol` order; each doc's pack is the example its FIRST token
    * lands in: `pack_id = start_offset div budget`.
    *
    * `streamCols` shards the corpus into independent streams (e.g.
    * (lang, doc_id % k)): packing is inherently sequential within a
    * stream, so shard count — not corpus size — bounds the window
    * parallelism; any deterministic sharding yields valid packs.
    * The running sum is a partitioned cumulative window: one shuffle
    * on the stream key, no single-reducer stage.
    *
    * Returns the input plus (start_off, pack_id, n_tokens). */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    budget: Int, streamCols: Seq[Column]): DataFrame =
    packSequencesByCount(df, idCol, tokenCount(col(textCol)), budget,
      streamCols)

  /** [[packSequences]] with the per-document token count supplied by
    * the caller — e.g. `size(piece_ids)` so packs are laid out by the
    * REAL tokenizer's counts (the sequences a pretraining pipeline
    * ships), not the whitespace approximation. Same cumulative-window
    * shape, same (start_off, pack_id, n_tokens) contract. */
  def packSequencesByCount(df: DataFrame, idCol: String, countCol: Column,
                           budget: Int, streamCols: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget > 0, "token budget must be positive")
    val w = Window.partitionBy(streamCols: _*).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", countCol.cast("long"))
      .withColumn("start_off",
        sum("n_tokens").over(w) - col("n_tokens"))
      .withColumn("pack_id",
        (col("start_off") / lit(budget)).cast("long"))
  }

  /** Content fingerprint: md5 of head shingle + token count + char
    * count — a cheap document signature for blocking. */
  def fingerprint(text: Column): Column = {
    val toks = tokens(text)
    md5(concat_ws("|",
      concat_ws(" ", slice(toks, 1, 3)),
      size(toks).cast("string"),
      length(text).cast("string")))
  }

  /** Word n-gram shingles (n consecutive tokens joined by space) —
    * input to MinHash. */
  def shingles(text: Column, n: Int): Column =
    array_distinct(ngramsOfTokens(tokens(text), n))

  /** Word n-grams WITH multiplicity, in document order — `shingles`
    * minus the dedup. Repetition metrics (Gopher-style quality
    * filters) need how often each n-gram occurs, not just the set. */
  def ngrams(text: Column, n: Int): Column = ngramsOfTokens(tokens(text), n)

  /** n-gram construction over an already-split token array — the
    * native [[graft.functions.NgramsF]] expression: one codegen-fused
    * loop emitting each gram as a single concat, replacing the
    * zip_with fold of n shifted slices this started as (HOFs don't
    * codegen; the fold paid n-1 interpreted array passes). Identical
    * results incl. edges: fewer than n tokens degrade to one
    * whole-text entry (empty text to none). The fold formulation
    * survives as [[ngramsOfTokensHof]], spec-pinned equivalent. */
  def ngramsOfTokens(toks: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    // coalesce restores the HOF formulation's null edge: a NULL token
    // array yields an EMPTY gram array (the when/otherwise fold never
    // produced null), where the native expression propagates null
    coalesce(
      ColumnBridge.column(
        graft.functions.NgramsF(ColumnBridge.expression(toks), n)),
      typedLit(Array.empty[String]))
  }

  /** The higher-order-function formulation `ngramsOfTokens` replaced —
    * kept as the executable spec of the native expression's semantics
    * (NgramEquivalenceSpec sweeps them against each other). */
  private[graft] def ngramsOfTokensHof(toks: Column, n: Int): Column = {
    val len = size(toks)
    val joined = (2 to n).foldLeft(slice(toks, lit(1), len - (n - 1))) {
      (acc, k) => zip_with(acc, slice(toks, lit(k), len - (n - 1)),
        (a, b) => concat(a, lit(" "), b))
    }
    if (n <= 1) filter(joined, s => s =!= "")
    else when(len >= n, joined)
      .otherwise(filter(array(concat_ws(" ", toks)), s => s =!= ""))
  }

  /** Highest multiplicity of any element of a string array: sort, then
    * one aggregate pass tracking the longest run of equal neighbours.
    * Entirely per-row (no explode, no shuffle) — the repetition family
    * stays embarrassingly parallel over documents at any corpus size.
    * Empty array → 0. */
  def maxMultiplicity(arr: Column): Column = {
    val sorted = array_sort(arr)
    aggregate(sorted,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best")),
      (acc, x) => {
        val run = when(x <=> acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
  }

  /** Gopher-style per-document repetition metrics: token count, top
    * token / top bigram fraction, duplicated-trigram fraction. Every
    * metric is a per-row array expression over staged projections
    * (each array evaluated once — see `ngramsOfTokens`), so the pass
    * is stateless and shuffle-free: it runs identically over a batch
    * frame or a `readStream` micro-batch. Empty/blank documents have
    * no n-grams; their fractions are defined as 0.0 (no repetition),
    * never NaN. */
  def repetitionMetrics(df: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    // multiplicity/cardinality run per document over token, bigram
    // and trigram arrays — the native codegen'd expressions replace
    // the interpreted sort+fold (identical results, see
    // MaxMultiplicityF) on this hot path
    graft.functions.GraftFunctions.register(df.sparkSession)
    import graft.functions.GraftFunctions.{maxMultF, nDistinctF}
    val toks = col("__toks")
    val bis = col("__bis")
    val tris = col("__tris")
    def frac(num: Column, arr: Column): Column =
      when(size(arr) > 0, round(num.cast("double") / size(arr), 4))
        .otherwise(lit(0.0))
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), toks,
        ngramsOfTokens(toks, 2).as("__bis"),
        ngramsOfTokens(toks, 3).as("__tris"))
      .select(col(idCol),
        size(toks).cast("long").as("n_tokens"),
        frac(maxMultF(toks), toks).as("top_token_frac"),
        frac(maxMultF(bis), bis).as("top_bigram_frac"),
        when(size(tris) > 0, round(lit(1.0) -
          nDistinctF(tris).cast("double") / size(tris), 4))
          .otherwise(lit(0.0))
          .as("dup_trigram_frac"))
  }

  /** PII patterns (Java regex, codegen'd via regexp_replace — no UDF).
    * Replacement order matters: emails first (their local part may
    * contain digits), then SSN-shaped ids and IPv4 (both would
    * otherwise be eaten by the broader phone pattern), phones last. */
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val ssnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  private val ipRe = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  private val phoneRe = "\\+?\\d[\\d\\s().-]{6,}\\d"

  /** Mask emails / SSN-shaped ids / IPv4 / phone numbers with typed
    * placeholder tokens — the scrub pass a training-data pipeline runs
    * before export. Pure per-row native expressions: stays inside
    * whole-stage codegen, zero shuffles. */
  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, emailRe, "<EMAIL>")
    val s = regexp_replace(e, ssnRe, "<ID>")
    val i = regexp_replace(s, ipRe, "<IP>")
    regexp_replace(i, phoneRe, "<PHONE>")
  }

  /** Disjoint match counts per PII category, mirroring `redactPii`'s
    * replacement order: ids are counted after emails are masked and
    * IPs after ids, so one identifier is never reported in two
    * categories (an email with an SSN-shaped local part counts as an
    * email only). Phones excluded: their pattern intentionally overlaps
    * everything and only fires after the rest is masked. */
  def piiCounts(text: Column): Column = {
    val e = regexp_replace(text, emailRe, "<EMAIL>")
    val s = regexp_replace(e, ssnRe, "<ID>")
    struct(
      regexp_count(text, lit(emailRe)).cast("long").as("emails"),
      regexp_count(e, lit(ssnRe)).cast("long").as("ids"),
      regexp_count(s, lit(ipRe)).cast("long").as("ips"))
  }

  /** Content-defined chunking (the rsync / storage-dedup family):
    * split each document at token positions whose hash satisfies
    * `h mod divisor == 0` — boundaries move WITH the content, so an
    * insertion early in a document only changes the chunks it touches,
    * unlike fixed-size chunking which shifts every later chunk. Chunk
    * id = running count of boundaries (the same window shape as
    * sessionization); chunk hash = md5 of the order-preserved token
    * span. Shared chunk hashes across documents are the dedup signal
    * (common boilerplate, quoted passages, mirrored content).
    *
    * Returns (idCol, chunk_id, chunk_hash, n_tokens). Expected chunk
    * length ≈ `divisor` tokens. One shuffle on the doc id for the
    * running count, one on (doc, chunk) for the span hash.
    */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
                divisor: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(idCol).orderBy("idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("idx", "tok")))
      .withColumn("boundary",
        when(Dedup.shingleHash(col("tok")) % divisor === 0, 1L).otherwise(0L))
      .withColumn("chunk_id", sum("boundary").over(byDoc))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("idx"), col("tok")))),
            s => s.getField("tok")))).as("chunk_hash"),
        count(lit(1)).as("n_tokens"))
  }

  /** Winnowing-style rolling-hash fingerprints (Schleimer et al.,
    * SIGMOD'03 — the standard document-fingerprint family): hash each
    * `w`-token window with a polynomial rolling hash over md5-derived
    * token integers, keep each document's `k` smallest window hashes.
    * Documents sharing a fingerprint are near-dup candidates (an
    * equi-join on the hash value — same scale shape as LSH banding).
    *
    * The window hash is a single `lead()` pass — no explode, one
    * shuffle on the doc id — and all arithmetic is integer mod 2^31-1,
    * so the oracle reproduces it bit-for-bit with the identical
    * formula. Returns (idCol, fp) with k rows per document (fewer for
    * docs shorter than w + k tokens).
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         w: Int = 4, k: Int = 4): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val fps = ColumnBridge.column(graft.functions.WinnowF(
      ColumnBridge.expression(tokens(col(textCol))), w, k))
    df.select(col(idCol), explode(fps).as("fp"))
  }

  /** The exploded-window formulation [[winnowFingerprints]] replaced —
    * kept as the executable spec of [[graft.functions.WinnowF]]'s
    * semantics (WinnowEquivalenceSpec sweeps them against each
    * other). Two doc-keyed shuffles vs. the expression's zero. */
  private[graft] def winnowFingerprintsWindowed(
      df: DataFrame, idCol: String, textCol: String,
      w: Int = 4, k: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val P = Dedup.MinhashP
    val B = 1000003L
    // coefficients B^(w-1-j) mod P as driver literals (BigInt-exact)
    val coefs = (0 until w).map(j =>
      BigInt(B).modPow(BigInt(w - 1 - j), BigInt(P)).toLong)
    val byDoc = Window.partitionBy(idCol).orderBy("idx")
    val th = df
      .select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("idx", "tok")))
      .select(col(idCol), col("idx"), Dedup.shingleHash(col("tok")).as("h"))
    val terms = (0 until w).map(j =>
      (lead(col("h"), j).over(byDoc) * coefs(j)) % P)
    val wh = th
      .withColumn("wh", terms.reduce(_ + _) % P)
      .where(col("wh").isNotNull)
      .select(col(idCol), col("wh"))
      .distinct()
    val ranked = Window.partitionBy(idCol).orderBy("wh")
    wh.withColumn("rnk", row_number().over(ranked))
      .where(col("rnk") <= k)
      .select(col(idCol), col("wh").as("fp"))
  }
}
