package graft.queries

import org.apache.spark.sql.functions._
import Queries.{Entry, t}

/** Second tranche of TPC-H shapes (Q12, Q14–Q22) adapted to the
  * fixture schema. No partsupp / shipmode / commitdate columns exist,
  * so Q12 buckets by ship delay instead of ship mode, Q20's excess
  * inventory becomes excess ship share, Q21's lateness is
  * ship-vs-order delay — each keeps the ORIGINAL query's relational
  * signature (conditional aggregation over a join; correlated
  * threshold; EXISTS + NOT EXISTS) — and Q22's phone country code
  * becomes a key-modulo class. PURE money sums (q18's o_totalprice, q22's
  * balance total) go through DECIMAL before the double cast so
  * summation order can't move a rounding boundary; revenue PRODUCT
  * sums (q14/q15/q17/q19) follow the established round(sum(double))
  * convention of q5–q10 — a double→DECIMAL cast of the product would
  * trade the (empirically stable) last-ulp risk for a cross-engine
  * rounding-mode dependency.
  */
object StarQueries2 {

  /** Q14: promo revenue share inside one ship month (conditional
    * aggregate over a fact-dim join). */
  val q14PromoShare: Entry = Entry(
    "q14_promo_revenue",
    (s, dir) => t(s, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .agg(
        round(lit(100) *
          sum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1) - col("l_discount")))
            .otherwise(0.0)) /
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6)
          .as("promo_share"),
        count(lit(1)).as("n")),
    Some("""SELECT round(100 * sum(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        |    / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_share,
        |  count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin))

  /** Q15: top supplier(s) by quarterly revenue — aggregate, then keep
    * the rows equal to the global max. The max is a 1-row aggregate
    * cross-joined back (auto-broadcast): unlike `max over an empty
    * window partition`, which moves the whole per-supplier frame to a
    * single reducer, this keeps the frame partitioned and ships one
    * scalar — the shape that survives O(suppliers) growing 100x.
    * The oracle uses the equivalent scalar-subquery form. */
  val q15TopSupplier: Entry = Entry(
    "q15_top_supplier",
    (s, dir) => {
      val rev = t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("total_rev"))
      val mx = rev.agg(max("total_rev").as("mx"))
      t(s, dir, "supplier")
        .join(rev.join(broadcast(mx)).where(col("total_rev") === col("mx"))
          .drop("mx"), col("s_suppkey") === col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    },
    Some("""WITH rev AS (
        |  SELECT l_suppkey,
        |    round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_rev
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin))

  /** Q16: supplier counts per (brand, type, size) bucket — distinct
    * aggregate over a join with NOT-IN dimension filters. */
  val q16PartsSuppliers: Entry = Entry(
    "q16_parts_suppliers",
    (s, dir) => t(s, dir, "part")
      .where(col("p_brand") =!= "Brand#1" &&
        col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
      .join(t(s, dir, "lineitem"), col("p_partkey") === col("l_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size")),
    Some("""SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin))

  /** Q17: revenue from small-quantity orders — correlated scalar
    * subquery (0.2 × per-part average quantity) planned as a join with
    * a per-part aggregate. Quantities are integer-valued doubles, so
    * both engines' averages are bit-identical. */
  val q17SmallQuantity: Entry = Entry(
    "q17_small_quantity",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val perPart = li.groupBy(col("l_partkey").as("ap_partkey"))
        .agg(avg("l_quantity").as("avg_qty"))
      li.join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .where(col("p_brand") === "Brand#23")
        .join(perPart, col("l_partkey") === col("ap_partkey"))
        .where(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(round(sum("l_extendedprice") / 7.0, 4).as("avg_yearly"),
          count(lit(1)).as("n"))
    },
    Some("""SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly,
        |  count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#23'
        |  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        |                    WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin))

  /** Q18: large-volume customers — HAVING over a grouped join, then
    * re-join dimensions for the report. */
  val q18LargeVolume: Entry = Entry(
    "q18_large_volume_customers",
    (s, dir) => {
      val bigOrders = t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum("l_quantity").cast("long").as("sum_qty"))
        .where(col("sum_qty") > 150)
      t(s, dir, "orders")
        .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_totalprice").cast("decimal(18,2)").cast("double")
            .as("total_price"),
          col("sum_qty"))
        .orderBy(col("total_price").desc, col("o_orderkey"))
    },
    Some("""SELECT c_custkey, c_name, o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
        |  CAST(sum_qty AS BIGINT) AS sum_qty
        |FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING sum(l_quantity) > 150) big
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_price DESC, o_orderkey""".stripMargin))

  /** Q19: discounted revenue under three disjunctive brand/size/qty
    * predicate branches — the OR-of-ANDs pushdown shape. */
  val q19DiscountedRevenue: Entry = Entry(
    "q19_discounted_revenue",
    (s, dir) => t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .where(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("revenue"), count(lit(1)).as("n")),
    Some("""SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |  count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin))

  /** Q22 shape: positive-balance customers above the class average with
    * no HIGH-VALUE orders (anti join + scalar-subquery threshold); the
    * phone country code becomes a key-modulo class, and the no-orders
    * clause becomes no-orders-above-300k because every fixture customer
    * has at least one order (a bare anti join would be vacuously
    * empty). The money sum goes through DECIMAL so summation order
    * can't move the 2-dp rounding. */
  val q22GlobalSales: Entry = Entry(
    "q22_global_sales",
    (s, dir) => {
      val cust = t(s, dir, "customer")
        .withColumn("cntrycode", col("c_custkey") % 7)
        .where(col("cntrycode").isin(0, 1, 2))
      val avgBal = cust.where(col("c_acctbal") > 0)
        .agg(avg("c_acctbal")).first().getDouble(0)
      cust.where(col("c_acctbal") > avgBal)
        .join(t(s, dir, "orders").where(col("o_totalprice") > 300000)
            .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(count(lit(1)).as("numcust"),
          round(sum(col("c_acctbal").cast("decimal(18,2)")).cast("double"), 2)
            .as("totacctbal"))
        .orderBy("cntrycode")
    },
    Some("""WITH cust AS (
        |  SELECT c_custkey, c_acctbal, c_custkey % 7 AS cntrycode
        |  FROM customer WHERE c_custkey % 7 IN (0, 1, 2))
        |SELECT cntrycode, count(*) AS numcust,
        |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
        |    AS totacctbal
        |FROM cust
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM cust WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_totalprice > 300000)
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin))

  /** Deterministic KMV distinct-count sketch (ops/Sketches) next to
    * the exact count — unlike HLL, the estimate itself is
    * oracle-checked because the k-minimum md5 hashes are engine-
    * independent. */
  val kmvDistinct: Entry = Entry(
    "kmv_distinct_parts",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      graft.ops.Sketches.kmvDistinct(li, Seq("l_returnflag"), "l_partkey",
          k = 64)
        .join(li.groupBy("l_returnflag")
          .agg(countDistinct("l_partkey").as("exact_distinct")),
          Seq("l_returnflag"))
        .orderBy("l_returnflag")
    },
    Some(s"""WITH h AS (
        |  SELECT DISTINCT l_returnflag, ${OracleSql.hex12ToBigint("hx")} AS h
        |  FROM (SELECT l_returnflag,
        |          md5(CAST(l_partkey AS VARCHAR)) AS hx FROM lineitem)),
        |r AS (
        |  SELECT l_returnflag, h, row_number() OVER (
        |    PARTITION BY l_returnflag ORDER BY h) AS rn
        |  FROM h),
        |s AS (
        |  SELECT l_returnflag, count(*) AS n, max(h) AS kth
        |  FROM r WHERE rn <= 64 GROUP BY l_returnflag),
        |x AS (
        |  SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_distinct
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT s.l_returnflag,
        |  CASE WHEN n < 64 THEN CAST(n AS DOUBLE)
        |       ELSE round(63.0 * 281474976710656 / kth, 4) END AS est_distinct,
        |  exact_distinct
        |FROM s JOIN x ON s.l_returnflag = x.l_returnflag
        |ORDER BY s.l_returnflag""".stripMargin))

  /** Q12 adapted (no shipmode / commit/receipt dates in the fixture):
    * shipping-delay buckets instead of ship modes — lines shipped ≤90
    * vs >90 days after the order date, counting high- vs low-priority
    * orders per bucket. Same shape as TPC-H Q12: one fact-dim join,
    * conditional aggregation on the dimension attribute. */
  val q12ShippingDelay: Entry = Entry(
    "q12_shipping_delay",
    (s, dir) => t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .withColumn("bucket",
        when(datediff(col("l_shipdate"), col("o_orderdate")) > 90, "late")
          .otherwise("ontime"))
      .groupBy("bucket")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("bucket"),
    Some("""SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) > 90
        |    THEN 'late' ELSE 'ontime' END AS bucket,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY bucket ORDER BY bucket""".stripMargin))

  /** Q20 adapted (no partsupp): suppliers holding an EXCESS SHARE of a
    * part's shipped volume — per (supplier, part) quantity vs a fifth of
    * the part's total, the correlated-threshold shape of Q20's scalar
    * subquery. Both aggregates key on l_partkey, so the share join is
    * co-partitioned; supplier names arrive by broadcast. */
  val q20ExcessShare: Entry = Entry(
    "q20_excess_share",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
      val perSupp = li.groupBy("l_partkey", "l_suppkey")
        .agg(sum("l_quantity").as("supp_qty"))
      val perPart = li.groupBy("l_partkey")
        .agg(sum("l_quantity").as("part_qty"))
      val excess = perSupp.join(perPart, "l_partkey")
        .where(col("supp_qty") > col("part_qty") * 0.2)
      excess.groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_dominated_parts"),
          round(sum(col("supp_qty") - col("part_qty") * 0.2), 2).as("excess_qty"))
        .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("n_dominated_parts"), col("excess_qty"))
        .orderBy(col("n_dominated_parts").desc, col("s_suppkey"))
        .limit(50)
    },
    Some("""WITH per_supp AS (
        |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
        |  FROM lineitem GROUP BY 1, 2),
        |per_part AS (
        |  SELECT l_partkey, sum(l_quantity) AS part_qty
        |  FROM lineitem GROUP BY 1),
        |excess AS (
        |  SELECT l_suppkey, supp_qty, part_qty
        |  FROM per_supp JOIN per_part USING (l_partkey)
        |  WHERE supp_qty > part_qty * 0.2)
        |SELECT s_suppkey, s_name,
        |  count(*) AS n_dominated_parts,
        |  round(sum(supp_qty - part_qty * 0.2), 2) AS excess_qty
        |FROM excess JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_suppkey, s_name
        |ORDER BY n_dominated_parts DESC, s_suppkey LIMIT 50""".stripMargin))

  /** Q21 adapted (lateness = shipped >180 days after the order date):
    * suppliers late on a multi-supplier order where NO other supplier
    * was late — Q21's EXISTS + NOT EXISTS signature, compiled to one
    * left-semi (another supplier exists) and one left-anti (no other
    * late supplier) on (order, supplier)-distinct frames. All joins
    * key on l_orderkey, so the three frames share one partitioning. */
  val q21ExclusiveLate: Entry = Entry(
    "q21_exclusive_late",
    (s, dir) => {
      val lo = t(s, dir, "lineitem")
        .join(t(s, dir, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (datediff(col("l_shipdate"), col("o_orderdate")) > 180).as("late"))
      val dist = lo.select("l_orderkey", "l_suppkey").distinct()
      val lateDist = lo.where(col("late"))
        .select("l_orderkey", "l_suppkey").distinct()
      // fully renamed probe sides: self-joins over shared lineage are
      // ambiguous if any attribute name survives on both sides
      val others = dist.select(col("l_orderkey").as("x_okey"),
        col("l_suppkey").as("x_skey"))
      val lateOthers = lateDist.select(col("l_orderkey").as("x_okey"),
        col("l_suppkey").as("x_skey"))
      val exclusive = lateDist
        .join(others, col("x_okey") === col("l_orderkey") &&
          col("x_skey") =!= col("l_suppkey"), "left_semi")
        .join(lateOthers, col("x_okey") === col("l_orderkey") &&
          col("x_skey") =!= col("l_suppkey"), "left_anti")
      exclusive.groupBy("l_suppkey")
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
        .limit(100)
    },
    Some("""WITH lo AS (
        |  SELECT l_orderkey, l_suppkey,
        |    datediff('day', o_orderdate, l_shipdate) > 180 AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |dist AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lo),
        |late_dist AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lo WHERE late)
        |SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM late_dist l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM dist l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late_dist l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_suppkey, s_name
        |ORDER BY numwait DESC, s_suppkey LIMIT 100""".stripMargin))

  val entries: Seq[Entry] = Seq(q12ShippingDelay, q14PromoShare,
    q15TopSupplier, q16PartsSuppliers, q17SmallQuantity, q18LargeVolume,
    q19DiscountedRevenue, q20ExcessShare, q21ExclusiveLate, q22GlobalSales,
    kmvDistinct)
}
