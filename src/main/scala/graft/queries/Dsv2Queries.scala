package graft.queries

import org.apache.spark.sql.functions._

import graft.lake.TableStore
import graft.queries.Queries.{t, Entry}
import graft.sources.{GraftCatalog, GraftScanMetrics}

/** DataSource V2 surface queries: store tables read by VANILLA Spark
  * — `spark.read.format("graft")` and a registered `TableCatalog` —
  * with no GraftSql involvement anywhere on the read path. The
  * reference registers its Delta output for Athena exactly so other
  * engines can read it (delta/delta_tables.py:41-72); this is the
  * Spark-native equivalent, with manifest semantics (MoR deletes,
  * column mapping, stats file skipping, time travel) intact. */
object Dsv2Queries {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** `spark.read.format("graft")` over a table in merge-on-read state
    * (append + equality delete, never compacted): the DSv2 scan must
    * apply the delete debt and serve the pushed filter via the stats
    * sidecar (the `require` makes manifest-level file skipping
    * load-bearing — the filtered plan must touch fewer files than the
    * full one). Oracle: the same filter + aggregate over the
    * surviving rows, from scratch. */
  val dsv2ReadPath: Entry = Entry(
    "dsv2_read_path",
    (s, dir) => {
      val root = tmpDir("graft-dsv2")
      val store = new TableStore(s, root)
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity").as("qty"))
      // commits arrive in disjoint l_orderkey ranges, so the sidecar's
      // per-file min/max can prove most files irrelevant to the probe.
      // The cut is EXACT (max/2, floor) so the oracle derives the
      // same split — an approximate percentile would diverge between
      // engines.
      val cut = li.agg(max(col("l_orderkey"))).first().getLong(0) / 2
      store.create("li_v2", li.where(col("l_orderkey") <= cut).coalesce(2))
      store.append("li_v2", li.where(col("l_orderkey") > cut).coalesce(2))
      store.appendWithDeletes("li_v2", li.limit(0),
        deleteKeys = li.select("l_orderkey")
          .where(col("l_orderkey") % 5 === 0).distinct())
      // vanilla Spark from here on — no store/GraftSql on the read
      val df = s.read.format("graft").load(s"$root/li_v2")
      val served = df.where(col("l_orderkey") <= cut)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("qty").as("sum_qty"))
      val out = served.orderBy("l_returnflag").cache()
      out.count()
      val filteredFiles = GraftScanMetrics.lastScanFiles.get()
      df.groupBy("l_returnflag").count().count()
      val fullFiles = GraftScanMetrics.lastScanFiles.get()
      require(filteredFiles < fullFiles,
        s"dsv2_read_path expected the pushed l_orderkey filter to prune " +
          s"files at the manifest ($filteredFiles !< $fullFiles)")
      out
    },
    Some("""WITH cut AS (
        |  SELECT max(l_orderkey) // 2 AS c FROM lineitem)
        |SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem, cut
        |WHERE l_orderkey % 5 <> 0 AND l_orderkey <= cut.c
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** A registered graft [[org.apache.spark.sql.connector.catalog.TableCatalog]]:
    * plain `spark.sql` resolves `gq.<table>`, including native
    * `VERSION AS OF` time travel — the query joins the CURRENT
    * aggregate against the version-0 one, proving both resolve the
    * manifest (v0 = the pre-append subset). Oracle recomputes both
    * sides from the fixture. */
  val dsv2CatalogSql: Entry = Entry(
    "dsv2_catalog_sql",
    (s, dir) => {
      val root = tmpDir("graft-dsv2c")
      val store = new TableStore(s, root)
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").cast("decimal(18,4)").as("price"))
      store.create("ord_v2", ord.where(col("o_orderkey") % 4 =!= 0))
      store.append("ord_v2", ord.where(col("o_orderkey") % 4 === 0))
      s.conf.set("spark.sql.catalog.gq", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq.root", root)
      s.sql(
        """SELECT cur.o_orderstatus, cur.n AS n_cur,
          |  CAST(cur.sum_price AS DOUBLE) AS sum_price, old.n AS n_v0
          |FROM (SELECT o_orderstatus, count(*) AS n, sum(price) AS sum_price
          |      FROM gq.ord_v2 GROUP BY o_orderstatus) cur
          |JOIN (SELECT o_orderstatus, count(*) AS n
          |      FROM gq.ord_v2 VERSION AS OF 0 GROUP BY o_orderstatus) old
          |  USING (o_orderstatus)
          |ORDER BY o_orderstatus""".stripMargin)
    },
    Some("""SELECT cur.o_orderstatus, cur.n AS n_cur, cur.sum_price, old.n AS n_v0
        |FROM (SELECT o_orderstatus, count(*) AS n,
        |        CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |          AS sum_price
        |      FROM orders GROUP BY o_orderstatus) cur
        |JOIN (SELECT o_orderstatus, count(*) AS n
        |      FROM orders WHERE o_orderkey % 4 <> 0
        |      GROUP BY o_orderstatus) old
        |  USING (o_orderstatus)
        |ORDER BY o_orderstatus""".stripMargin))

  val entries: Seq[Entry] = Seq(dsv2ReadPath, dsv2CatalogSql)
}
