package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized histories against the CDF telescoping law: whatever
  * order appends, narrowing/keeping overwrites, MoR deletes, RENAMEs
  * and compactions interleave in, `changes(fromV, toV)` applied to the
  * fromV snapshot (viewed under toV's mapping) must reproduce the toV
  * snapshot — for every adjacent pair, the full range, and random
  * sub-ranges. This is the law the example-based ChangesSpec pins on
  * curated histories, fuzzed over histories nobody curated. */
class ChangesPropertySpec extends SparkSpec {
  import spark.implicits._

  test("random histories with renames, rewrites and MoR deletes telescope") {
    for (seed <- Seq(7, 31)) {
      val rnd = new scala.util.Random(seed)
      val store = new TableStore(spark, tmpDir(s"cprop$seed"))
      val t = s"c$seed"
      var valCol = "v"
      var nextId = 0
      var renameN = 0
      def rows(n: Int) = (0 until n).map { _ =>
        nextId += 1; (nextId, s"r${rnd.nextInt(100)}")
      }.toDF("id", valCol)
      store.create(t, rows(3))
      for (step <- 1 to 8) {
        rnd.nextInt(5) match {
          case 0 => store.append(t, rows(1 + rnd.nextInt(2)))
          case 1 => // overwrite keeping a random half plus fresh rows
            val keep = store.read(t).where(col("id") % 2 === step % 2)
            store.overwrite(t, keep.unionByName(rows(1)))
          case 2 => // MoR delete of one existing row + insert, one commit
            val ids = store.read(t).select("id").as[Int].collect()
            val dead =
              if (ids.isEmpty) Seq.empty[Int]
              else Seq(ids(rnd.nextInt(ids.length)))
            store.appendWithDeletes(t, rows(1), dead.toDF("id"))
          case 3 => // metadata-only rename of the value column
            renameN += 1
            val nn = s"v$renameN"
            store.renameColumn(t, valCol, nn)
            valCol = nn
          case 4 => store.compact(t)
        }
      }
      val cur = store.currentVersion(t).get
      for (v <- 1L to cur) FeedLaws.telescopes(store, t, v - 1, v)
      FeedLaws.telescopes(store, t, 0L, cur)
      for (_ <- 1 to 3) {
        val i = rnd.nextInt(cur.toInt).toLong
        val j = i + 1 + rnd.nextInt((cur - i).toInt)
        FeedLaws.telescopes(store, t, i, j)
      }
    }
  }
}
