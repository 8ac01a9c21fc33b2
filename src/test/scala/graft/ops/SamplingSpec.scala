package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hash sampling is deterministic and near the target fraction") {
    val df = spark.range(10000).toDF("id")
    val a = Sampling.hashSample(df, "id", 0.3, salt = "s1")
      .select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(df, "id", 0.3, salt = "s1")
      .select("id").as[Long].collect().toSet
    assert(a == b) // same rows every run
    assert(math.abs(a.size - 3000) < 300, s"got ${a.size}") // ~binomial 3sd
  }

  test("different salts give independent selections") {
    val df = spark.range(10000).toDF("id")
    val a = Sampling.hashSample(df, "id", 0.5, salt = "train")
      .select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(df, "id", 0.5, salt = "eval")
      .select("id").as[Long].collect().toSet
    val overlap = a.intersect(b).size.toDouble
    // independent 50% gates overlap ~25% of the population
    assert(math.abs(overlap - 2500) < 400, s"overlap $overlap")
  }

  test("a smaller fraction selects a subset of a larger one (same salt)") {
    val df = spark.range(5000).toDF("id")
    val small = Sampling.hashSample(df, "id", 0.1, salt = "s")
      .select("id").as[Long].collect().toSet
    val big = Sampling.hashSample(df, "id", 0.4, salt = "s")
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(big)) // nested splits: grow a sample stably
  }

  test("stratifiedExact returns exactly n per stratum, stable under repartitioning") {
    val df = spark.range(3000)
      .select(col("id"), (col("id") % 3).cast("string").as("grp"))
    val a = Sampling.stratifiedExact(df, "grp", "id", n = 25, salt = "x")
      .select("id").as[Long].collect().toSet
    val b = Sampling.stratifiedExact(df.repartition(13), "grp", "id",
        n = 25, salt = "x")
      .select("id").as[Long].collect().toSet
    assert(a == b, "selection changed under repartitioning")
    val sizes = Sampling.stratifiedExact(df, "grp", "id", n = 25, salt = "x")
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(sizes == Map("0" -> 25L, "1" -> 25L, "2" -> 25L))
    // a stratum smaller than n is returned whole
    val tiny = Sampling.stratifiedExact(df.where(col("id") < 5), "grp", "id",
      n = 25, salt = "x")
    assert(tiny.count() == 5)
  }

  test("mixBySource applies per-source rates") {
    val df = spark.range(6000)
      .select(col("id"), when(col("id") % 2 === 0, "a").otherwise("b").as("src"))
    val out = Sampling.mixBySource(df, "src", "id",
        rates = Map("a" -> 0.9), defaultRate = 0.1, salt = "m")
      .groupBy("src").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(out("a") - 2700) < 300, s"a=${out("a")}")
    assert(math.abs(out("b") - 300) < 150, s"b=${out("b")}")
  }

  test("DSIR weights rank target-like documents above dissimilar ones") {
    // raw corpus: half "science" phrasing, half "spam" phrasing; the
    // target is pure science — science docs must out-weigh spam docs
    val sci = (0 until 20).map(i =>
      (i.toLong, s"the quantum theory of fields lecture $i notes"))
    val spam = (20 until 40).map(i =>
      (i.toLong, s"buy cheap pills now offer $i click here"))
    val raw = (sci ++ spam).toDF("doc_id", "text")
    val target = (100 until 110).map(i =>
      (i.toLong, s"the quantum theory of gravity lecture $i notes"))
      .toDF("doc_id", "text")
    val w = Sampling.dsirLogWeights(raw, target, "doc_id", "text", 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val worstSci = sci.map(d => w(d._1)).min
    val bestSpam = spam.map(d => w(d._1)).max
    assert(worstSci > bestSpam,
      s"science floor $worstSci should beat spam ceiling $bestSpam")
    // resample selects exactly k, deterministically, science-first
    val sel = Sampling.dsirResample(raw, target, "doc_id", "text", 64,
      k = 15, salt = "t").select("doc_id").as[Long].collect()
    val sel2 = Sampling.dsirResample(raw, target, "doc_id", "text", 64,
      k = 15, salt = "t").select("doc_id").as[Long].collect()
    assert(sel.toSeq == sel2.toSeq)
    assert(sel.count(_ < 20) >= 12, s"selection not target-shaped: ${sel.toSeq}")
  }

  test("temperatureQuotas: sums to total, caps at population, alpha extremes") {
    val counts = Seq("en" -> 218L, "zh" -> 75L, "es" -> 73L,
      "de" -> 70L, "fr" -> 64L)
    val q = Sampling.temperatureQuotas(counts, alpha = 0.5, total = 100L)
    assert(q.map(_._2).sum == 100L)
    val m = q.toMap
    // alpha=0.5 flattens: en's raw share is 43.6%, its sqrt share less
    assert(m("en") < 44L && m("en") > 20L, s"en quota off: $m")
    assert(m.values.forall(_ > 0))
    // alpha = 1 is proportional-ish (floor+LR of raw shares)
    val q1 = Sampling.temperatureQuotas(counts, alpha = 1.0, total = 100L)
    assert(q1.toMap.apply("en") == 44L || q1.toMap.apply("en") == 43L)
    // alpha = 0 is uniform across strata
    val q0 = Sampling.temperatureQuotas(counts, alpha = 0.0, total = 100L)
    assert(q0.map(_._2).toSet == Set(20L))
    // quotas never exceed the population
    val qc = Sampling.temperatureQuotas(Seq("a" -> 3L, "b" -> 1000L),
      alpha = 0.5, total = 500L)
    assert(qc.toMap.apply("a") <= 3L)
  }

  test("temperatureSample: deterministic, partition-independent, quota-exact") {
    val docs = (1L to 400L).map(i => (i, s"l${i % 4}")).toDF("doc_id", "lang")
    def run(parts: Int) = Sampling.temperatureSample(
      docs.repartition(parts), "lang", "doc_id", 0.5, 60L, "s1")
    val (a, qa) = run(2)
    val (b, qb) = run(7)
    assert(qa == qb)
    val ra = a.select("doc_id").as[Long].collect().sorted.toSeq
    val rb = b.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ra == rb, "sample depends on partitioning")
    val perLang = a.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang == qa.toMap.filter(_._2 > 0), s"quota mismatch: $perLang vs $qa")
  }
}
