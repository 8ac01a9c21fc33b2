package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized IVM correctness: a seeded sequence of arbitrary source
  * commits — appends, merge-on-read equality deletes, positional
  * deletion vectors (deleteWhere), full overwrites — interleaved with
  * refreshes and partial-folds; after EVERY refresh the view's
  * consolidated read must equal a from-scratch recompute of
  * count/sum/avg/min/max over the source's current state. This is
  * the invariant every hand-written leg asserts once, driven across
  * the whole commit-class cross product by the generator. */
class MaterializedViewPropertySpec extends SparkSpec {
  import spark.implicits._

  private def recompute(store: TableStore): Seq[(String, Long,
      Option[Double], Option[Double], Option[Double], Option[Double])] =
    store.read("t")
      .groupBy("g").agg(count(lit(1)).as("cnt"), sum("x").as("sum_x"),
        avg("x").as("avg_x"), min("x").as("min_x"), max("x").as("max_x"))
      .orderBy("g")
      .as[(String, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().toSeq

  private def viewState(store: TableStore): Seq[(String, Long,
      Option[Double], Option[Double], Option[Double], Option[Double])] =
    MaterializedView.read(store, "m")
      .select("g", "cnt", "sum_x", "avg_x", "min_x", "max_x").orderBy("g")
      .as[(String, Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect().toSeq

  for (seed <- Seq(7, 1234))
  test(s"random commit sequences keep view == recompute [seed $seed]") {
    val rnd = new scala.util.Random(seed)
    val store = new TableStore(spark, tmpDir(s"mvprop$seed"))
    var nextId = 0L
    val live = scala.collection.mutable.ArrayBuffer.empty[Long]
    def rows(n: Int) = {
      val out = (0 until n).map { _ =>
        val id = nextId; nextId += 1; live += id
        (id, s"g${rnd.nextInt(4)}",
          if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(100).toDouble))
      }
      out.toDF("id", "g", "x")
    }
    store.create("t", rows(6))
    MaterializedView.create(store, "m", "t", Seq("g"), Seq("x"),
      minCols = Seq("x"), maxCols = Seq("x"), avgCols = Seq("x"))
    var checks = 0
    (1 to 14).foreach { step =>
      rnd.nextInt(4) match {
        case 0 => // plain append
          store.append("t", rows(2 + rnd.nextInt(4)))
        case 1 => // MoR equality delete (+ sometimes reinsert in-commit)
          val victims = rnd.shuffle(live.toSeq)
            .take(1 + rnd.nextInt(3.max(live.size / 4)))
          live --= victims
          store.appendWithDeletes("t",
            if (rnd.nextBoolean()) rows(2) else rows(0),
            deleteKeys = victims.toDF("id"))
        case 2 => // positional deletion vector on a value predicate
          val cut = rnd.nextInt(100)
          val goners = store.read("t").where(col("x") < cut)
            .select("id").as[Long].collect().toSet
          store.deleteWhere("t", col("x") < lit(cut.toDouble))
          live --= goners
        case 3 => // full rewrite: no row-level lineage, bag-diff feed
          live.clear()
          store.overwrite("t", rows(4 + rnd.nextInt(4)))
      }
      if (step % 2 == 0) {
        MaterializedView.refresh(store, "m")
        if (rnd.nextBoolean()) MaterializedView.compactPartials(store, "m")
        val (got, want) = (viewState(store), recompute(store))
        assert(got == want,
          s"seed $seed step $step diverged:\n got  $got\n want $want")
        checks += 1
      }
    }
    assert(checks >= 7)
  }
}
