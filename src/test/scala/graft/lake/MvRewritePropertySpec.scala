package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized rewrite-parity fuzz: seeded random aggregate queries —
  * group subsets (possibly empty), measure mixes, residual WHEREs,
  * HAVING, ORDER BY/LIMIT — through the front door over a store with
  * a fresh bound view. The invariant is unconditional: whatever the
  * matcher decides (serve or fall through), the answer must equal
  * direct execution. A second counter asserts the matcher is not
  * vacuously abstaining. */
class MvRewritePropertySpec extends SparkSpec {
  import spark.implicits._

  for (seed <- Seq(3, 977))
  test(s"random aggregate queries: rewrite decision never changes the answer [seed $seed]") {
    val rnd = new scala.util.Random(seed)
    val store = new TableStore(spark, tmpDir(s"mvrwprop$seed"))
    store.create("t", (1 to 60).map { i =>
      (i.toLong, "g" + (i % 3), "h" + (i % 2),
        if (i % 7 == 0) null else java.lang.Double.valueOf(i.toDouble))
    }.toDF("id", "g", "h", "x"))
    MaterializedView.create(store, "m", "t", Seq("g", "h"), Seq("x"),
      filter = None, minCols = Seq("x"), maxCols = Seq("x"),
      avgCols = Seq("x"))
    store.append("t", (61 to 80).map(i =>
      (i.toLong, "g" + (i % 3), "h" + (i % 2),
        java.lang.Double.valueOf(i.toDouble))).toDF("id", "g", "h", "x"))
    MaterializedView.refresh(store, "m")

    val measures = Seq("count(*)", "count(x)", "sum(x)", "avg(x)",
      "min(x)", "max(x)", "sum(id)" /* unmaintained → direct */)
    var servedCount = 0
    (1 to 40).foreach { i =>
      val groups = rnd.shuffle(Seq("g", "h")).take(rnd.nextInt(3))
      val ms = rnd.shuffle(measures).take(1 + rnd.nextInt(3)).zipWithIndex
        .map { case (m, j) => s"$m AS m$j" }
      val sel = (groups ++ ms).mkString(", ")
      val where = rnd.nextInt(3) match {
        case 0 => ""
        case 1 => " WHERE g <> 'g0'"
        case 2 => " WHERE h = 'h1' AND g <> 'g2'"
      }
      val groupBy = if (groups.isEmpty) ""
        else " GROUP BY " + groups.mkString(", ")
      val having = if (groups.nonEmpty && rnd.nextBoolean())
        " HAVING count(*) > " + rnd.nextInt(30) else ""
      val order = if (rnd.nextBoolean()) "" else {
        val key = if (groups.nonEmpty && rnd.nextBoolean())
          groups.head else "m0"
        s" ORDER BY $key${if (rnd.nextBoolean()) " DESC" else ""}"
      }
      val limit = if (order.nonEmpty && rnd.nextBoolean())
        " LIMIT " + (1 + rnd.nextInt(4)) else ""
      val sql = s"SELECT $sel FROM t$where$groupBy$having$order$limit"
      val before = MvRewrite.hits.get()
      val got = GraftSql.execute(spark, store, sql)
      val gotRows = got.orderBy(got.columns.map(col): _*).collect().toSeq
      if (MvRewrite.hits.get() > before) servedCount += 1
      spark.conf.set(MvRewrite.EnabledKey, "false")
      val want = try {
        val w = GraftSql.execute(spark, store, sql)
        w.orderBy(w.columns.map(col): _*).collect().toSeq
      } finally spark.conf.set(MvRewrite.EnabledKey, "true")
      assert(gotRows == want,
        s"seed $seed query $i diverged under rewrite:\n  $sql\n" +
          s"  got  $gotRows\n  want $want")
    }
    assert(servedCount >= 10,
      s"matcher abstained almost always ($servedCount/40) — fuzz is vacuous")
  }

  for (seed <- Seq(17, 5151))
  test(s"random STAR queries (USING/ON, aliases, any dim order): decision never changes the answer [seed $seed]") {
    val rnd = new scala.util.Random(seed)
    val store = new TableStore(spark, tmpDir(s"mvrwsprop$seed"))
    store.create("f", (1 to 60).map { i =>
      (i.toLong, (i % 5).toLong, (i % 3).toLong,
        if (i % 11 == 0) null else java.lang.Double.valueOf(i.toDouble))
    }.toDF("id", "k1", "k2", "x"))
    store.create("d1", (0 to 4).map(k => (k.toLong, "s" + (k % 2)))
      .toDF("k1", "seg"))
    store.create("d2", (0 to 2).map(k => (k.toLong, "r" + k))
      .toDF("k2", "reg"))
    MaterializedView.createStar(store, "m", "f",
      Seq("d1" -> Seq("k1"), "d2" -> Seq("k2")),
      Seq("seg", "reg"), Seq("x"), avgCols = Seq("x"),
      minCols = Seq("x"), maxCols = Seq("x"))
    // all three tables move before the fuzz; one refresh folds them
    store.append("f", (61 to 75).map(i =>
      (i.toLong, (i % 5).toLong, (i % 3).toLong,
        java.lang.Double.valueOf(i.toDouble))).toDF("id", "k1", "k2", "x"))
    store.appendWithDeletes("d1", Seq((0L, "s9")).toDF("k1", "seg"),
      deleteKeys = Seq(0L).toDF("k1"))
    MaterializedView.refresh(store, "m")

    val measures = Seq("count(*)", "count(x)", "sum(x)", "avg(x)",
      "min(x)", "max(x)", "count(DISTINCT seg)", "count(DISTINCT reg)",
      "sum(id)" /* unmaintained → direct */)
    var servedCount = 0
    (1 to 40).foreach { i =>
      // random FROM: dims in either order, each join USING or an
      // ON equi-condition, tables optionally aliased
      val alias = rnd.nextBoolean()
      def nameOf(t: String) = if (alias) t + "_a" else t
      def relOf(t: String) = if (alias) s"$t ${t}_a" else t
      val dims = rnd.shuffle(Seq(("d1", "k1"), ("d2", "k2")))
      val from = dims.foldLeft(relOf("f")) { case (acc, (d, k)) =>
        if (rnd.nextBoolean()) s"$acc JOIN ${relOf(d)} USING ($k)"
        else s"$acc JOIN ${relOf(d)} ON ${nameOf("f")}.$k = ${nameOf(d)}.$k"
      }
      val groups = rnd.shuffle(Seq("seg", "reg")).take(rnd.nextInt(3))
      val ms = rnd.shuffle(measures).take(1 + rnd.nextInt(3)).zipWithIndex
        .map { case (m, j) => s"$m AS m$j" }
      val sel = (groups ++ ms).mkString(", ")
      val where = rnd.nextInt(4) match {
        case 0 => ""
        case 1 => " WHERE seg <> 's0'"
        case 2 => " WHERE reg = 'r1' AND seg <> 's9'"
        case 3 => " WHERE x > 10" // non-group residual → direct
      }
      val groupBy = if (groups.isEmpty) ""
        else " GROUP BY " + groups.mkString(", ")
      val having = if (groups.nonEmpty && rnd.nextBoolean())
        " HAVING count(*) > " + rnd.nextInt(15) else ""
      val order = if (rnd.nextBoolean()) "" else {
        val key = if (groups.nonEmpty && rnd.nextBoolean())
          groups.head else "m0"
        s" ORDER BY $key${if (rnd.nextBoolean()) " DESC" else ""}"
      }
      // LIMIT demands a TOTAL order or the query itself is
      // nondeterministic (ties hand back whichever row either plan
      // met first) — append the group keys as tiebreakers
      val tiebreak = if (groups.isEmpty) "" else ", " + groups.mkString(", ")
      val limit = if (order.nonEmpty && rnd.nextBoolean())
        s"$tiebreak LIMIT " + (1 + rnd.nextInt(4)) else ""
      val sql = s"SELECT $sel FROM $from$where$groupBy$having$order$limit"
      val before = MvRewrite.hits.get()
      val got = GraftSql.execute(spark, store, sql)
      val gotRows = got.orderBy(got.columns.map(col): _*).collect().toSeq
      if (MvRewrite.hits.get() > before) servedCount += 1
      spark.conf.set(MvRewrite.EnabledKey, "false")
      val want = try {
        val w = GraftSql.execute(spark, store, sql)
        w.orderBy(w.columns.map(col): _*).collect().toSeq
      } finally spark.conf.set(MvRewrite.EnabledKey, "true")
      assert(gotRows == want,
        s"seed $seed query $i diverged under rewrite:\n  $sql\n" +
          s"  got  $gotRows\n  want $want")
    }
    assert(servedCount >= 8,
      s"matcher abstained almost always ($servedCount/40) — fuzz is vacuous")
  }
}
