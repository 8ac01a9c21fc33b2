package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized two-cursor IVM correctness: seeded arbitrary commit
  * sequences on BOTH the fact and the dim — appends, MoR equality
  * deletes, positional deleteWhere, full overwrites, dim re-keys,
  * duplicate dim keys (join multiplicity), fact keys with no dim
  * match — interleaved with refreshes and partial folds; after every
  * refresh the join view must equal a from-scratch join-aggregate
  * over the CURRENT state of both tables. Exercises every feed class
  * through the Δ(F⋈D) = ΔF⋈D_new ⊕ F_old⋈ΔD fold, including both
  * sides changing in the same refresh window. */
class MaterializedViewJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private type Row6 = (String, Long, Option[Double], Option[Double],
    Option[Double], Option[Double])

  private def recompute(store: TableStore): Seq[Row6] =
    store.read("f").join(store.read("d"), Seq("k"))
      .groupBy("seg").agg(count(lit(1)).as("cnt"), sum("x").as("sum_x"),
        avg("x").as("avg_x"), min("x").as("min_x"), max("x").as("max_x"))
      .orderBy("seg")
      .as[Row6].collect().toSeq

  private def viewState(store: TableStore): Seq[Row6] =
    MaterializedView.read(store, "m")
      .select("seg", "cnt", "sum_x", "avg_x", "min_x", "max_x")
      .orderBy("seg")
      .as[Row6].collect().toSeq

  for (seed <- Seq(11, 4242))
  test(s"random fact+dim commit sequences keep join view == recompute [seed $seed]") {
    val rnd = new scala.util.Random(seed)
    val store = new TableStore(spark, tmpDir(s"mvjprop$seed"))
    var nextId = 0L
    val liveF = scala.collection.mutable.ArrayBuffer.empty[Long]
    def factRows(n: Int) = {
      val out = (0 until n).map { _ =>
        val id = nextId; nextId += 1; liveF += id
        // keys 0..9 against dim keys 0..7: some fact rows unmatched
        (id, rnd.nextInt(10).toLong,
          if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(100).toDouble))
      }
      out.toDF("id", "k", "x")
    }
    def dimRows(n: Int) = (0 until n).map { _ =>
      (rnd.nextInt(8).toLong, s"s${rnd.nextInt(4)}")
    }.toDF("k", "seg")
    store.create("f", factRows(8))
    store.create("d", dimRows(5))
    // min/max included: every delete class below (fact MoR, fact DV,
    // dim re-key, full overwrites on either side) must drive the
    // join-side extremum repair, and the reset-epoch fence must hold
    // across dim-only refreshes (the cursor-sum epoch)
    MaterializedView.createJoined(store, "m", "f", "d", Seq("k"),
      Seq("seg"), Seq("x"), avgCols = Seq("x"),
      minCols = Seq("x"), maxCols = Seq("x"))
    var checks = 0
    (1 to 14).foreach { step =>
      rnd.nextInt(7) match {
        case 0 => // fact append
          store.append("f", factRows(2 + rnd.nextInt(4)))
        case 1 => // fact MoR equality delete (+ sometimes reinsert)
          val victims = rnd.shuffle(liveF.toSeq)
            .take(1 + rnd.nextInt(3.max(liveF.size / 4)))
          liveF --= victims
          store.appendWithDeletes("f",
            if (rnd.nextBoolean()) factRows(2) else factRows(0),
            deleteKeys = victims.toDF("id"))
        case 2 => // fact positional deletion vector
          val cut = rnd.nextInt(100)
          val goners = store.read("f").where(col("x") < cut)
            .select("id").as[Long].collect().toSet
          store.deleteWhere("f", col("x") < lit(cut.toDouble))
          liveF --= goners
        case 3 => // dim re-key: move one key to a new segment
          val k = rnd.nextInt(8).toLong
          store.appendWithDeletes("d",
            Seq((k, s"s${rnd.nextInt(4)}")).toDF("k", "seg"),
            deleteKeys = Seq(k).toDF("k"))
        case 4 => // dim append — may introduce DUPLICATE keys (N:M)
          store.append("d", dimRows(1 + rnd.nextInt(2)))
        case 5 => // dim full rewrite: bag-diff feed on the dim side
          store.overwrite("d", dimRows(4 + rnd.nextInt(3)))
        case 6 => // fact full rewrite: bag-diff on the fact side
          liveF.clear()
          store.overwrite("f", factRows(4 + rnd.nextInt(4)))
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
