package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized sequences of DML and maintenance against an executable
  * model: whatever order appends, overwrites, MoR deletes, OPTIMIZE,
  * VACUUM and RESTORE interleave in, the table's content must equal
  * the model's, and every retained version must read back as the
  * content the model recorded when it was current. Maintenance ops
  * must be content-neutral; RESTORE must be a snapshot copy. */
class MaintenancePropertySpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Set[(Int, String)]) =
    rows.toSeq.toDF("id", "v")

  test("random DML + maintenance interleavings preserve the content model") {
    for (seed <- Seq(11, 23, 47)) {
      val rnd = new scala.util.Random(seed)
      val store = new TableStore(spark, tmpDir(s"mprop$seed"))
      val t = s"m$seed"
      var content = Set.empty[(Int, String)]
      var snapshots = Map.empty[Long, Set[(Int, String)]]
      var nextId = 0
      def freshRows(n: Int): Set[(Int, String)] = {
        val rows = (0 until n).map { _ =>
          nextId += 1; (nextId, s"r${rnd.nextInt(1000)}")
        }.toSet
        rows
      }
      store.create(t, df(freshRows(3).map { r => content += r; r }))
      snapshots += store.currentVersion(t).get -> content
      def record(): Unit = {
        snapshots += store.currentVersion(t).get -> content
        // forget snapshots whose version the store no longer retains
        val live = store.versions(t).toSet
        snapshots = snapshots.filter { case (v, _) => live(v) }
      }
      for (step <- 1 to 14) {
        rnd.nextInt(7) match {
          case 0 => // append
            val rows = freshRows(1 + rnd.nextInt(3))
            store.append(t, df(rows)); content ++= rows
          case 1 => // overwrite with a mutation of current content
            val keep = content.filter(_ => rnd.nextBoolean())
            val rows = keep ++ freshRows(1)
            store.overwrite(t, df(rows)); content = rows
          case 2 => // merge-on-read delete + insert in one commit
            val dead = content.filter(_ => rnd.nextInt(3) == 0).map(_._1)
            val rows = freshRows(1 + rnd.nextInt(2))
            store.appendWithDeletes(t, df(rows),
              dead.toSeq.toDF("id"))
            content = content.filterNot(r => dead(r._1)) ++ rows
          case 3 => // OPTIMIZE (debt fold + small-file bin-pack): neutral
            GraftSql.execute(spark, store, s"OPTIMIZE $t")
          case 4 => // VACUUM RETAIN k VERSIONS: neutral for current
            val k = 1 + rnd.nextInt(3)
            GraftSql.execute(spark, store, s"VACUUM $t RETAIN $k VERSIONS")
          case 5 => // RESTORE to a random retained version — one the
            // model RECORDED: an op that commits >1 version per step
            // leaves retained versions with no snapshot entry, and the
            // lookup below would throw instead of failing the property
            val vs = store.versions(t).filter(snapshots.contains)
            val v = vs(rnd.nextInt(vs.size))
            GraftSql.execute(spark, store, s"RESTORE TABLE $t VERSION AS OF $v")
            content = snapshots(v)
          case 6 => // partition evolution: content-neutral by design —
            // future writes land under the new layout, old files stay
            val layout = Seq(Seq("v"), Seq("id"), Nil)(rnd.nextInt(3))
            GraftSql.execute(spark, store,
              s"ALTER TABLE $t SET PARTITIONED BY (${layout.mkString(", ")})")
        }
        record()
        val got = store.read(t).select("id", "v")
          .as[(Int, String)].collect().toSet
        assert(got == content,
          s"seed $seed step $step: content diverged\n got=$got\n exp=$content")
      }
      // every retained snapshot still time-travels to what it was
      snapshots.foreach { case (v, expect) =>
        val got = store.readVersion(t, v).select("id", "v")
          .as[(Int, String)].collect().toSet
        assert(got == expect, s"seed $seed: version $v diverged")
      }
    }
  }
}
