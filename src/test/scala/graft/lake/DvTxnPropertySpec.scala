package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Model-based property test over the round-8 storage surface:
  * random sequences of append / positional delete / positional
  * update / MoR append-with-deletes / compact / transactions replay
  * against an in-memory model; after EVERY op the table must equal
  * the model exactly. Rollbacks restore the model snapshot; commits
  * apply it — so a staged commit leaking early or a vector
  * deleting/resurrecting the wrong rows fails at the op where it
  * happens, not at the end. */
class DvTxnPropertySpec extends SparkSpec {
  import spark.implicits._

  private type Rec = (Int, Int, Long) // (id, m, v)

  private def check(store: TableStore, model: Seq[Rec], ctx: String): Unit = {
    val got = store.read("t").select("id", "m", "v").as[(Int, Int, Long)]
      .collect().sorted.toSeq
    val want = model.sorted
    assert(got == want, s"$ctx: got ${got.take(8)}... want ${want.take(8)}...")
  }

  for (seed <- Seq(11, 42, 77)) test(s"random op sequence matches the model (seed $seed)") {
    val rnd = new scala.util.Random(seed)
    val store = new TableStore(spark, tmpDir("dvprop"))
    var nextId = 0
    def fresh(n: Int): Seq[Rec] = (0 until n).map { _ =>
      nextId += 1; (nextId, rnd.nextInt(5), rnd.nextInt(100).toLong)
    }
    var model: Seq[Rec] = fresh(20)
    store.create("t", model.toDF("id", "m", "v"))
    var inTxn = false
    var txnSnapshot: Seq[Rec] = Nil

    for (step <- 1 to 18) {
      val op = rnd.nextInt(10)
      op match {
        case 0 | 1 => // append
          val rows = fresh(1 + rnd.nextInt(5))
          store.append("t", rows.toDF("id", "m", "v"))
          model = model ++ rows
        case 2 | 3 => // positional delete on a non-key predicate
          val x = rnd.nextInt(5)
          store.deleteWhere("t", col("m") === x)
          model = model.filterNot(_._2 == x)
        case 4 | 5 => // positional update
          val x = rnd.nextInt(5)
          store.updateWhere("t", col("m") === x,
            Map("v" -> (col("v") + 1000L)))
          model = model.map(r => if (r._2 == x) r.copy(_3 = r._3 + 1000L) else r)
        case 6 => // MoR upsert: delete keys + reinsert
          if (model.nonEmpty) {
            val keys = rnd.shuffle(model.map(_._1)).take(1 + rnd.nextInt(3))
            val rows = keys.map(k => (k, rnd.nextInt(5), 7777L))
            store.appendWithDeletes("t", rows.toDF("id", "m", "v"),
              keys.map(Tuple1(_)).toDF("id"))
            model = model.filterNot(r => keys.contains(r._1)) ++ rows
          }
        case 7 => // fold all read-side debt
          store.compact("t")
        case 8 => // transaction boundary
          if (!inTxn) {
            store.beginTransaction(); inTxn = true; txnSnapshot = model
          } else { store.commitTransaction(); inTxn = false }
        case 9 =>
          if (inTxn) {
            store.rollbackTransaction(); inTxn = false; model = txnSnapshot
          }
      }
      check(store, model, s"seed=$seed step=$step op=$op")
    }
    if (inTxn) { store.commitTransaction(); inTxn = false }
    check(store, model, s"seed=$seed final")
    // and the folded table equals the model too
    store.compact("t")
    check(store, model, s"seed=$seed after final compact")
  }
}
