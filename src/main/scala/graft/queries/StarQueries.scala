package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import Queries.{Entry, t}

/** Star-schema breadth: the full relational operator surface the engine
  * must support beyond the reference's own operators (SURVEY §2.3 note:
  * "Our engine exercises the full Spark join surface anyway").
  * Every query: total-order ORDER BY, rounded double aggregates.
  */
object StarQueries {

  /** TPC-H Q5 shape: 6-way join, small dims broadcast by Catalyst. */
  val q5RegionalRevenue: Entry = Entry(
    "q5_regional_revenue",
    (s, dir) => {
      val region = t(s, dir, "region").where(col("r_name") === "ASIA")
      val nation = t(s, dir, "nation")
      val customer = t(s, dir, "customer")
      val orders = t(s, dir, "orders")
      val lineitem = t(s, dir, "lineitem")
      val supplier = t(s, dir, "supplier")
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(customer, col("o_custkey") === col("c_custkey"))
        .join(supplier, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin))

  /** Left outer join with null-aware aggregation. */
  val joinLeftOuter: Entry = Entry(
    "join_left_outer_nation_customers",
    (s, dir) => t(s, dir, "nation")
      .join(t(s, dir, "customer"),
        col("n_nationkey") === col("c_nationkey"), "left_outer")
      .groupBy("n_nationkey", "n_name")
      .agg(count(col("c_custkey")).as("n_customers"),
        round(coalesce(sum("c_acctbal"), lit(0.0)), 2).as("total_acctbal"))
      .orderBy("n_nationkey"),
    Some("""SELECT n_nationkey, n_name, count(c_custkey) AS n_customers,
        |  round(coalesce(sum(c_acctbal), 0), 2) AS total_acctbal
        |FROM nation LEFT OUTER JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY n_nationkey, n_name ORDER BY n_nationkey""".stripMargin))

  /** Left-semi join (EXISTS). */
  val joinSemi: Entry = Entry(
    "join_semi_customers_with_open_orders",
    (s, dir) => t(s, dir, "customer")
      .join(t(s, dir, "orders").where(col("o_orderstatus") === "O"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin))

  /** Full outer join of per-nation customer vs supplier counts. */
  val joinFullOuter: Entry = Entry(
    "join_full_outer_nation_counts",
    (s, dir) => {
      val c = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_cust"))
      val p = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nk2"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(p, col("nk") === col("nk2"), "full_outer")
        .select(coalesce(col("nk"), col("nk2")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nationkey")
    },
    Some("""SELECT coalesce(c.nk, p.nk2) AS nationkey,
        |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM (SELECT c_nationkey AS nk, count(*) AS n_cust
        |      FROM customer GROUP BY c_nationkey) c
        |FULL OUTER JOIN (SELECT s_nationkey AS nk2, count(*) AS n_supp
        |      FROM supplier GROUP BY s_nationkey) p ON c.nk = p.nk2
        |ORDER BY nationkey""".stripMargin))

  /** Distinct aggregation forms. Money total goes through an exact
    * DECIMAL sum: a double `avg` rounded at 4 dp can land exactly on a
    * half-way boundary with 2-decimal inputs (observed at sf0.001) and
    * then engines disagree in the last digit. */
  val aggDistinct: Entry = Entry(
    "agg_distinct_per_segment",
    (s, dir) => t(s, dir, "customer")
      .groupBy("c_mktsegment")
      .agg(countDistinct("c_nationkey").as("n_nations"),
        count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
          .as("total_bal"))
      .orderBy("c_mktsegment"),
    Some("""SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations,
        |  count(*) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  /** ROLLUP grouping set (null group keys coalesced to 'ALL' so NULL
    * sort-order dialect differences can't bite). */
  val aggRollup: Entry = Entry(
    "agg_rollup_returnflag_status",
    (s, dir) => t(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"), col("n"))
      .orderBy("rf", "ls"),
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin))

  /** CUBE grouping set. */
  val aggCube: Entry = Entry(
    "agg_cube_status_priority",
    (s, dir) => t(s, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy("status", "priority"),
    Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin))

  /** Explicit GROUPING SETS — two DISJOINT single-column sets, which no
    * rollup/cube can express — with grouping_id() disambiguating which
    * set produced each row (a NULL key vs an aggregated-away key look
    * identical otherwise). Same one-shuffle Expand+Aggregate plan shape
    * as cube/rollup. */
  val aggGroupingSets: Entry = Entry(
    "agg_grouping_sets_disjoint",
    (s, dir) => t(s, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"),
        grouping_id().cast("long").as("gid"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("sum_qty"), col("gid"))
      .orderBy("gid", "rf", "ls"),
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY gid, rf, ls""".stripMargin))

  /** Analytic window functions: lag + rank + running frame sum. */
  val windowAnalytics: Entry = Entry(
    "window_customer_order_history",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          round(col("o_totalprice"), 2).as("price"),
          round(lag("o_totalprice", 1).over(w), 2).as("prev_price"),
          rank().over(w).as("rnk"),
          round(sum("o_totalprice")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("running_total"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate,
        |  round(o_totalprice, 2) AS price,
        |  round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
        |  rank() OVER w AS rnk,
        |  round(sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |        AND CURRENT ROW), 2) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin))

  /** Global sort + limit (top-k with full tiebreak). */
  val topkOrders: Entry = Entry(
    "topk_orders_by_price",
    (s, dir) => t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("price").desc, col("o_orderkey"))
      .limit(15),
    Some("""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        |FROM orders ORDER BY price DESC, o_orderkey LIMIT 15""".stripMargin))

  /** Set operations: INTERSECT / EXCEPT / UNION tagged into one result. */
  val setOps: Entry = Entry(
    "setops_nation_presence",
    (s, dir) => {
      val c = t(s, dir, "customer").select(col("c_nationkey").as("nk")).distinct()
      val p = t(s, dir, "supplier").select(col("s_nationkey").as("nk")).distinct()
      val both = c.intersect(p).withColumn("tag", lit("both"))
      val custOnly = c.except(p).withColumn("tag", lit("cust_only"))
      val suppOnly = p.except(c).withColumn("tag", lit("supp_only"))
      both.unionByName(custOnly).unionByName(suppOnly)
        .select("tag", "nk").orderBy("tag", "nk")
    },
    Some("""WITH c AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
        |     p AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
        |SELECT 'both' AS tag, nk FROM (SELECT nk FROM c INTERSECT SELECT nk FROM p)
        |UNION ALL
        |SELECT 'cust_only', nk FROM (SELECT nk FROM c EXCEPT SELECT nk FROM p)
        |UNION ALL
        |SELECT 'supp_only', nk FROM (SELECT nk FROM p EXCEPT SELECT nk FROM c)
        |ORDER BY tag, nk""".stripMargin))

  /** GROUP BY + HAVING. */
  val havingFilter: Entry = Entry(
    "having_supplier_volume",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy("l_suppkey")
      .agg(round(sum("l_quantity"), 2).as("total_qty"), count(lit(1)).as("n"))
      .where(col("total_qty") > 100)
      .orderBy("l_suppkey"),
    Some("""SELECT l_suppkey, round(sum(l_quantity), 2) AS total_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_suppkey
        |HAVING round(sum(l_quantity), 2) > 100 ORDER BY l_suppkey""".stripMargin))

  /** Scalar string/arithmetic/conditional functions. */
  val scalarFuncs: Entry = Entry(
    "scalar_string_funcs",
    (s, dir) => t(s, dir, "part")
      .select(col("p_partkey"),
        upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
        length(col("p_name")).as("name_len"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
        round(col("p_retailprice") * 1.1, 2).as("marked_up"),
        when(col("p_size") < 10, "small")
          .when(col("p_size") < 30, "medium")
          .otherwise("large").as("size_class"))
      .orderBy("p_partkey"),
    Some("""SELECT p_partkey, upper(substring(p_name, 1, 8)) AS name_prefix,
        |  length(p_name) AS name_len,
        |  p_brand || '/' || p_type AS brand_type,
        |  round(p_retailprice * 1.1, 2) AS marked_up,
        |  CASE WHEN p_size < 10 THEN 'small'
        |       WHEN p_size < 30 THEN 'medium'
        |       ELSE 'large' END AS size_class
        |FROM part ORDER BY p_partkey""".stripMargin))

  /** Higher-order array functions (§2.6 scalar breadth): transform /
    * filter / aggregate over the embedding arrays — all codegen-
    * friendly per-row lambdas, zero shuffles before the output sort.
    * Both engines fold the sum left-to-right over double-cast floats,
    * so the accumulation is bit-identical. */
  val arrayHof: Entry = Entry(
    "scalar_array_hof",
    (s, dir) => t(s, dir, "embeddings")
      // fold over the null-filtered array: DuckDB's list_sum SKIPS null
      // elements while a raw Spark fold would null the whole sum — the
      // filter keeps both engines identical if a null ever appears
      .select(col("vec_id"),
        round(expr("aggregate(filter(embedding, x -> x IS NOT NULL)," +
          " CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE))"), 4)
          .as("sum_v"),
        expr("size(filter(embedding, x -> x > 0))").cast("long").as("n_pos"),
        round(sqrt(expr("aggregate(filter(embedding, x -> x IS NOT NULL)," +
          " CAST(0.0 AS DOUBLE)," +
          " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")), 4)
          .as("norm"))
      .orderBy("vec_id"),
    Some("""SELECT vec_id,
        |  round(list_sum(list_transform(embedding,
        |        x -> CAST(x AS DOUBLE))), 4) AS sum_v,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
        |  round(sqrt(list_sum(list_transform(embedding,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS norm
        |FROM embeddings ORDER BY vec_id""".stripMargin))

  /** Date/time extraction + truncation functions. */
  val dateFuncs: Entry = Entry(
    "date_extract_monthly_orders",
    (s, dir) => t(s, dir, "orders")
      .select(year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        col("o_totalprice"))
      .groupBy("yr", "mo")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy("yr", "mo"),
    Some("""SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY yr, mo ORDER BY yr, mo""".stripMargin))

  /** Correlated scalar subquery shape (decorrelated by Catalyst). */
  val subqueryAboveAvg: Entry = Entry(
    "subquery_above_avg_balance",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val nationAvg = c.groupBy(col("c_nationkey").as("nk"))
        .agg(avg("c_acctbal").as("nation_avg"))
      c.join(broadcast(nationAvg), col("c_nationkey") === col("nk"))
        .where(col("c_acctbal") > col("nation_avg"))
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name FROM customer c
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2
        |                   WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin))

  /** Distribution window functions: ntile, percent_rank, cume_dist,
    * first/last value with explicit frames. */
  val windowDistribution: Entry = Entry(
    "window_distribution_funcs",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal"), col("c_custkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"),
          first("c_custkey").over(wf).as("poorest"),
          last("c_custkey").over(wf).as("richest"))
        .orderBy("c_mktsegment", "c_custkey")
    },
    Some("""SELECT c_mktsegment, c_custkey,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume,
        |  first_value(c_custkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND UNBOUNDED FOLLOWING) AS poorest,
        |  last_value(c_custkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND UNBOUNDED FOLLOWING) AS richest
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin))

  /** TPC-H Q2 shape: min-per-group subquery join (cheapest part per
    * brand, matched back against the detail row). */
  val q2MinCost: Entry = Entry(
    "q2_min_price_per_brand",
    (s, dir) => {
      val p = t(s, dir, "part")
      val mins = p.groupBy(col("p_brand").as("b"))
        .agg(min("p_retailprice").as("min_price"))
      p.join(broadcast(mins),
          col("p_brand") === col("b") && col("p_retailprice") === col("min_price"))
        .select(col("p_brand"), col("p_partkey"),
          round(col("p_retailprice"), 2).as("price"))
        .orderBy("p_brand", "p_partkey")
    },
    Some("""SELECT p_brand, p_partkey, round(p_retailprice, 2) AS price
        |FROM part p
        |WHERE p_retailprice = (SELECT min(p_retailprice) FROM part p2
        |                       WHERE p2.p_brand = p.p_brand)
        |ORDER BY p_brand, p_partkey""".stripMargin))

  /** Null-handling scalars: nullif / coalesce / null-safe compare over
    * computed nulls. */
  val nullHandling: Entry = Entry(
    "scalar_null_handling",
    (s, dir) => t(s, dir, "orders")
      .select(col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("O")).as("status_or_null"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status2"),
        (col("o_orderstatus") <=> lit("F")).as("is_f_nullsafe"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
        |  nullif(o_orderstatus, 'O') AS status_or_null,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status2,
        |  o_orderstatus IS NOT DISTINCT FROM 'F' AS is_f_nullsafe
        |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** TPC-H Q13 shape: distribution of customers by order count —
    * outer-join aggregate of an aggregate (all-integer, no float risk). */
  val q13OrderDistribution: Entry = Entry(
    "q13_customer_order_distribution",
    (s, dir) => {
      val perCust = t(s, dir, "customer")
        .join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |      GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin))

  /** TPC-H Q11 shape: per-part supplier volume kept when above a
    * fraction of the global total (scalar subquery over an aggregate;
    * integer quantities only). */
  val q11ImportantStock: Entry = Entry(
    "q11_important_stock",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val totalQty = li.agg(sum("l_quantity")).first().getDouble(0)
      li.groupBy("l_partkey")
        .agg(sum("l_quantity").cast("long").as("part_qty"))
        .where(col("part_qty") > totalQty / 1000)
        .orderBy(col("part_qty").desc, col("l_partkey"))
    },
    Some("""SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS part_qty
        |FROM lineitem GROUP BY l_partkey
        |HAVING sum(l_quantity) > (SELECT sum(l_quantity) FROM lineitem) / 1000
        |ORDER BY part_qty DESC, l_partkey""".stripMargin))

  /** SQL NOT IN three-valued logic — the classic silent-wrong-answer
    * trap: against a null-free subquery NOT IN is a plain anti join;
    * one NULL in the subquery makes every comparison UNKNOWN and the
    * result empty. Both counts in one row pins the semantics (Spark
    * plans the poisoned form as a null-aware anti join — the engines
    * must agree the answer is 0, not "nulls skipped"). */
  val notInNulls: Entry = Entry(
    "anti_join_not_in_nulls",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("nin_cust")
      t(s, dir, "orders").createOrReplaceTempView("nin_ord")
      s.sql("""
        |SELECT
        |  (SELECT count(*) FROM nin_cust WHERE c_custkey NOT IN
        |     (SELECT o_custkey FROM nin_ord
        |      WHERE o_totalprice > 100000)) AS n_plain,
        |  (SELECT count(*) FROM nin_cust WHERE c_custkey NOT IN
        |     (SELECT CASE WHEN o_orderkey % 2 = 0 THEN NULL
        |             ELSE o_custkey END
        |      FROM nin_ord WHERE o_totalprice > 100000)) AS n_null_poisoned
        |""".stripMargin)
    },
    Some("""SELECT
        |  (SELECT count(*) FROM customer WHERE c_custkey NOT IN
        |     (SELECT o_custkey FROM orders
        |      WHERE o_totalprice > 100000)) AS n_plain,
        |  (SELECT count(*) FROM customer WHERE c_custkey NOT IN
        |     (SELECT CASE WHEN o_orderkey % 2 = 0 THEN NULL
        |             ELSE o_custkey END
        |      FROM orders WHERE o_totalprice > 100000)) AS n_null_poisoned""".stripMargin))

  val entries: Seq[Entry] = Seq(
    q5RegionalRevenue, joinLeftOuter, joinSemi, joinFullOuter, aggDistinct,
    aggRollup, aggCube, aggGroupingSets, windowAnalytics,
    windowDistribution, topkOrders,
    setOps, havingFilter, scalarFuncs, arrayHof, dateFuncs, subqueryAboveAvg,
    q2MinCost, nullHandling, q13OrderDistribution, q11ImportantStock,
    notInNulls)
}
