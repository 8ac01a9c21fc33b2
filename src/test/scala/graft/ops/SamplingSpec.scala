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
}
