package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior tests for the LLM-pipeline operators on crafted inputs. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 0
    (2L, "completely different content about spark engines and data lakes at scale"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 0
    (4L, "unrelated text mentioning databases indexes transactions and storage")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .orderBy("keep_id")
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 2L), (1L, 1L), (2L, 1L), (4L, 1L)))
  }

  test("minhash LSH finds the exact and near duplicates, not the distinct docs") {
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((0L, 3L)), "exact dup pair missed")
    assert(cands.contains((0L, 1L)) || cands.contains((1L, 3L)), "near-dup pair missed")
    assert(!cands.contains((2L, 4L)), "distinct docs flagged")
  }

  test("jaccard is 1.0 for identical docs and low for distinct ones") {
    val pairs = Seq((0L, 3L), (2L, 4L)).toDF("a", "b")
    val out = Dedup.jaccard(docs, "doc_id", "text", pairs)
      .orderBy("a").as[(Long, Long, Double)].collect().toSeq
    assert(out(0)._3 == 1.0)
    assert(out(1)._3 < 0.2)
  }

  test("simhash of identical docs is identical; distinct docs differ") {
    val sh = Dedup.simhash(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long)].collect().toMap
    assert(sh(0L) == sh(3L))
    assert(sh(0L) != sh(2L))
  }

  test("language ID votes pick the list with most stopword hits") {
    val texts = Seq(
      (1L, "the cat and the dog of a house"),      // en
      (2L, "el gato y la casa de que si"),          // es
      (3L, "xyzzy plugh quux")                      // none -> unk
    ).toDF("id", "text")
    val lists = Seq(
      "en" -> Seq("the", "a", "of", "and", "to"),
      "es" -> Seq("el", "la", "de", "y", "que"))
    val out = texts.select(col("id"), TextOps.langId(col("text"), lists).as("l"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "en", 2L -> "es", 3L -> "unk"))
  }

  test("ANN LSH top-k achieves reasonable recall vs brute force") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val probes = emb.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, probes, k = 10)
      .select("qid", "vid").as[(Long, Long)].collect().toSet
    val approx = Similarity.annTopK(emb, probes, k = 10, numPlanes = 3,
        numTables = 6)
      .select("qid", "vid").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // 6 tables x 8 buckets over 500 vectors; sanity floor, not a tight bound
    assert(recall > 0.4, s"recall $recall suspiciously low")
    // and the ANN candidates must be a subset of plausible ids
    assert(approx.forall { case (q, v) => q != v })
  }

  test("semDedup keeps exactly the vectors with no lower-id near-dup in their cluster") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val tau = 0.4
    val cents = Similarity.kmeansCentroids(emb, nlist = 8, iterations = 2)
    val kept = Similarity.semDedup(emb, cents, tau)
      .as[(Long, Long, Long)].collect()
    assert(kept.length == 500, "one row per corpus vector")
    // recompute the policy brute-force from the same assignment
    val assigned = Similarity.assignClusters(emb, cents)
      .select(col("vec_id"), col("embedding"), col("cent_id"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getLong(2)))
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- x.indices) {
        d += x(i).toDouble * y(i); nx += x(i).toDouble * x(i)
        ny += y(i).toDouble * y(i)
      }
      math.rint(d / math.sqrt(nx * ny) * 1e4) / 1e4
    }
    val expectDrop = (for {
      (va, aa, ca) <- assigned
      (vb, ab, cb) <- assigned
      if ca == cb && va < vb && cos(aa, ab) >= tau
    } yield vb).toSet
    for ((id, _, keep) <- kept)
      assert((keep == 0L) == expectDrop.contains(id),
        s"vector $id keep=$keep disagrees with brute-force policy")
    assert(expectDrop.nonEmpty, "fixture produced no semantic near-dups")
  }

  test("typed top-k aggregator equals the window-rank formulation") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val probes = emb.where(col("vec_id") < 5)
    val windowed = Similarity.bruteForceTopK(emb, probes, k = 5)
      .select("qid", "rnk", "vid", "cos")
      .as[(Long, Int, Long, Double)].collect().toSet
    val p = probes.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val c = emb.select(col("vec_id").as("vid"), col("embedding").as("vvec"))
    val scored = c.join(broadcast(p), col("qid") =!= col("vid"))
      .select(col("qid"), col("vid"),
        round(Similarity.cosine(col("qvec"), col("vvec")), 4).as("cos"))
    val agged = TopK.topKPerGroup(spark, scored, k = 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(agged == windowed)
  }

  test("IVF top-k achieves reasonable recall vs brute force") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val probes = emb.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, probes, k = 10)
      .select("qid", "vid").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, probes, k = 10, nlist = 8, nprobe = 4)
      .select("qid", "vid").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall > 0.4, s"ivf recall $recall suspiciously low")
  }

  test("PQ codes compress to m entries per vector; ADC recall is sane") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val books = Similarity.pqTrain(emb, m = 8, ksub = 16)
    assert(books.count() == 8 * 16)
    val codes = Similarity.pqEncode(emb, books, m = 8)
    // exactly m codes per vector, all in [0, ksub)
    val perVec = codes.groupBy("vec_id").count()
      .select("count").as[Long].collect()
    assert(perVec.forall(_ == 8))
    val rng = codes.agg(min("code"), max("code")).as[(Long, Long)].head()
    assert(rng._1 >= 0 && rng._2 < 16)
    // encoding is deterministic
    val c1 = codes.orderBy("vec_id", "sub").collect().toSeq
    val c2 = Similarity.pqEncode(emb, books, m = 8)
      .orderBy("vec_id", "sub").collect().toSeq
    assert(c1 == c2)
    // ADC search against 32x-compressed codes still finds most of the
    // true top-k (quantization bound, not a tight guarantee)
    val probes = emb.where(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, probes, k = 10)
      .select("qid", "vid").as[(Long, Long)].collect().toSet
    val adc = Similarity.pqTopK(emb, probes, books, m = 8, k = 10)
      .select("qid", "vid").as[(Long, Long)].collect().toSet
    val recall = (exact & adc).size.toDouble / exact.size
    assert(recall > 0.3, s"pq recall $recall suspiciously low")
    assert(adc.forall { case (q, v) => q != v })
  }

  test("cosine of a vector with itself is 1") {
    val one = Seq((1L, Array(0.5f, 0.5f, 0.1f))).toDF("vec_id", "embedding")
    val c = one.select(round(Similarity.cosine(col("embedding"), col("embedding")), 6))
      .as[Double].head()
    assert(c == 1.0)
  }

  test("multimodal feature extraction matches the payload bytes") {
    val media = Multimodal.deriveMediaTable(
      Seq((7L, "abc")).toDF("doc_id", "text"))
    val f = Multimodal.extractFeatures(spark, media).collect().head
    assert(f.media_id == 7L && f.format == "fmt1")
    assert(f.n_bytes == 3L && f.head_sum == 97 + 98 + 99 && f.tail_byte == 99L)
  }

  test("expression feature path equals the typed codec-shape path") {
    val media = Multimodal.deriveMediaTable(
      Seq((0L, "abcdefghijXYZ"), (1L, "abc"), (2L, ""), (3L, "1234567890"))
        .toDF("doc_id", "text"))
    val typed = Multimodal.extractFeatures(spark, media).toDF()
      .orderBy("media_id").collect().toSeq
    val exprd = Multimodal.extractFeaturesExpr(media)
      .orderBy("media_id").collect().toSeq
    assert(typed == exprd)
  }

  test("int8 quantization reconstructs within scale/254 per component") {
    val df = Seq((1L, Array(0.5f, -0.25f, 0.127f, 0.0f)))
      .toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(df)
    val row = q.select(col("q_scale"),
        aggregate(zip_with(col("embedding"),
          Similarity.dequantize(col("q_scale"), col("q_codes")),
          (a, b) => abs(a.cast("double") - b)), lit(0.0),
          (acc, v) => greatest(acc, v)).as("max_err"))
      .as[(Double, Double)].head()
    val (scale, maxErr) = row
    assert(scale == 0.5)
    // symmetric int8: worst-case error is half a code step
    assert(maxErr <= scale / 254 + 1e-12, s"err $maxErr for scale $scale")
  }

  test("ngrams keeps multiplicity; maxMultiplicity counts the top run") {
    val df = Seq((0L, "a b a b a"), (1L, "x"), (2L, "c c c d"))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextOps.ngrams(col("text"), 2).as("bis"),
        TextOps.maxMultiplicity(TextOps.tokens(col("text"))).as("mt"),
        TextOps.maxMultiplicity(TextOps.ngrams(col("text"), 2)).as("mb"))
      .orderBy("doc_id").collect()
    assert(out(0).getSeq[String](1) == Seq("a b", "b a", "a b", "b a"))
    assert(out(0).getLong(2) == 3L && out(0).getLong(3) == 2L)
    // single-token doc: the clamped index sequence yields the bare token
    assert(out(1).getSeq[String](1) == Seq("x"))
    assert(out(1).getLong(2) == 1L && out(1).getLong(3) == 1L)
    assert(out(2).getLong(2) == 3L && out(2).getLong(3) == 2L)
    val empty = spark.range(1)
      .select(TextOps.maxMultiplicity(
        array().cast("array<string>")).as("m"))
      .head.getLong(0)
    assert(empty == 0L)
    // empty text degrades to no n-grams, not [""]
    val none = Seq((0L, "")).toDF("doc_id", "text")
      .select(TextOps.ngrams(col("text"), 2).as("g")).head.getSeq[String](0)
    assert(none == Seq.empty)
  }

  test("PII redaction masks emails, ids, IPs, phones; clean text is untouched") {
    val rows = Seq(
      (0L, "contact john.doe+x@example.co.uk or call +1 (415) 555-0199 now"),
      (1L, "server 10.0.42.7 ssn 123-45-6789"),
      (2L, "perfectly clean text with no identifiers at all")
    ).toDF("id", "text")
    val out = rows.select(col("id"),
        TextOps.redactPii(col("text")).as("red"),
        TextOps.piiCounts(col("text")).as("c"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == "contact <EMAIL> or call <PHONE> now")
    assert(out(1).getString(1) == "server <IP> ssn <ID>")
    assert(out(2).getString(1) ==
      "perfectly clean text with no identifiers at all")
    val c0 = out(0).getStruct(2)
    assert(c0.getLong(0) == 1L && c0.getLong(1) == 0L && c0.getLong(2) == 0L)
    val c1 = out(1).getStruct(2)
    assert(c1.getLong(0) == 0L && c1.getLong(1) == 1L && c1.getLong(2) == 1L)
    // overlap disjointness: an SSN-shaped email local part counts as
    // email only (ids are counted after emails are masked)
    val c2 = Seq((0L, "send to 123-45-6789@mail.com ok")).toDF("id", "text")
      .select(TextOps.piiCounts(col("text")).as("c")).head.getStruct(0)
    assert(c2.getLong(0) == 1L && c2.getLong(1) == 0L && c2.getLong(2) == 0L)
    // empty doc: metrics defined as 0.0, never NaN
    val m = TextOps.repetitionMetrics(
        Seq((0L, "")).toDF("doc_id", "text"), "doc_id", "text")
      .head
    assert(m.getDouble(2) == 1.0 && m.getDouble(3) == 0.0 &&
      m.getDouble(4) == 0.0)
  }

  test("scd2Build versions a change log: no-op drops, close times, current flags") {
    val changes = Seq(
      (1L, 10L, "bronze"),
      (1L, 20L, "bronze"), // no-op re-emit: must NOT mint a version
      (1L, 30L, "silver"),
      (1L, 40L, "gold"),
      (2L, 15L, "bronze"))
      .toDF("key", "ts", "tier")
    val out = Cdc.scd2Build(changes, Seq("key"), "ts", Seq("tier"))
      .select("key", "tier", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
      .sortBy(t => (t._1, t._3))
    assert(out.toSeq == Seq(
      (1L, "bronze", 10L, Some(30L), false), // closed by silver, not the no-op
      (1L, "silver", 30L, Some(40L), false),
      (1L, "gold", 40L, None, true),
      (2L, "bronze", 15L, None, true)))
  }

  test("scd2Build treats NULL attribute values null-safely") {
    val changes = Seq(
      (1L, 10L, Option.empty[String]),
      (1L, 20L, Option.empty[String]), // null == null: still a no-op
      (1L, 30L, Some("x")))
      .toDF("key", "ts", "tier")
    val out = Cdc.scd2Build(changes, Seq("key"), "ts", Seq("tier"))
      .select("valid_from").as[Long].collect().sorted
    assert(out.toSeq == Seq(10L, 30L))
  }

  test("mmrSelect: diversity demotes the near-duplicate of the first pick") {
    // doc 1: most relevant; doc 2: slightly less relevant but nearly
    // identical to doc 1; doc 3: less relevant, orthogonal. Pure
    // relevance ranks (1, 2, 3); MMR at λ=0.5 must rank (1, 3, 2).
    val cand = Seq(
      (7L, 1L, 100.0, Array(10.0, 0.0)),
      (7L, 2L, 99.0, Array(10.0, 0.1)),
      (7L, 3L, 80.0, Array(0.0, 10.0)))
      .toDF("qid", "vid", "rel", "vec")
    val out = Similarity.mmrSelect(cand, k = 3, lambda = 0.5)
      .collect().sortBy(_.rnk)
    assert(out.map(_.vid).toSeq == Seq(1L, 3L, 2L))
    assert(out.head.mmr == 50.0) // λ·rel, empty picked set
  }

  test("mmrSelect: λ=1 reduces to pure relevance; ties break by vid; k caps at candidates") {
    val cand = Seq(
      (1L, 5L, 10.0, Array(1.0, 0.0)),
      (1L, 4L, 10.0, Array(0.0, 1.0)), // tied rel -> vid 4 first
      (2L, 9L, 3.0, Array(1.0, 1.0)))
      .toDF("qid", "vid", "rel", "vec")
    val out = Similarity.mmrSelect(cand, k = 5, lambda = 1.0)
      .collect().groupBy(_.qid)
    assert(out(1L).sortBy(_.rnk).map(_.vid).toSeq == Seq(4L, 5L))
    assert(out(2L).map(_.vid).toSeq == Seq(9L)) // k > candidates: stops
  }

  test("mmrSelect caps unbounded candidate groups at the N most relevant") {
    val cand = (1 to 500).map(i => (1L, i.toLong, i.toDouble, Array(i.toDouble)))
      .toDF("qid", "vid", "rel", "vec")
    val out = Similarity.mmrSelect(cand, k = 2, lambda = 1.0,
      maxCandidates = 10).collect()
    // the cap keeps the 10 best by rel (491..500); picks are from those
    assert(out.map(_.vid).forall(_ > 490L))
  }
}
