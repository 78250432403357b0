package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** TPC-H-shaped analytical queries over the fixture star schema — the
  * general-analytics workload of the engine (scan-heavy aggregation,
  * selective multi-way joins, grouped top-k). These exercise exactly the
  * shapes that dominate at 100 TB: partial aggregation before the
  * exchange, broadcast of dimensions, pushdown of date/segment filters
  * into the parquet scan (asserted in PlanSpec for the medallion twins).
  *
  * Float determinism: unbounded double sums over 600 k rows are NOT
  * reproducible across engines at 6 decimals, so money aggregates cast to
  * DECIMAL(18,4) first — sums stay exact through the accumulation. The
  * FINAL emitted value is `round(cast(sum AS double), 6)` in BOTH engines:
  * Spark's DECIMAL result carries a fixed scale (`131202.0000`) while the
  * oracle path renders floats (`131202.0`), so emitting the decimal
  * directly hash-mismatches on trailing zeros even when the values are
  * identical. The double emission is the convention every other green
  * query uses; the sums are exact before the single terminal rounding.
  */
object AnalyticsQueries {

  private val Cut = "1998-06-30"

  val queries: Map[String, Query] = Map(

    // TPC-H Q1 shape: pricing summary over the fact table.
    "tpch_q1_pricing" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit(Cut).cast("timestamp"))
        .withColumn("price", col("l_extendedprice").cast("decimal(18,4)"))
        .withColumn("disc", col("l_discount").cast("decimal(18,4)"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,4)")).as("dec_qty"),
          sum(col("price")).as("dec_base_price"),
          sum((col("price") * (lit(1).cast("decimal(18,4)") - col("disc")))
            .cast("decimal(18,4)")).as("dec_disc_price"),
          count(lit(1)).as("count_order"))
        .select(col("l_returnflag"), col("l_linestatus"),
          round(col("dec_qty").cast("double"), 6).as("sum_qty"),
          round(col("dec_base_price").cast("double"), 6).as("sum_base_price"),
          round(col("dec_disc_price").cast("double"), 6).as("sum_disc_price"),
          col("count_order"),
          round(col("dec_qty").cast("double") / col("count_order"), 6)
            .as("avg_qty"))),

    // TPC-H Q3 shape: top-10 highest-revenue unshipped orders for a
    // customer segment (selective joins + grouped top-k).
    "tpch_q3_priority" -> ((s, dir) => {
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") < lit(Cut).cast("timestamp"))
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > lit(Cut).cast("timestamp"))
      broadcast(c).join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .withColumn("rev", (col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
          .cast("decimal(18,4)"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum(col("rev")).as("dec_rev"))
        // order on the ROUNDED double both engines emit: revenue sums of
        // scale-4 decimals are >= 1e-4 apart, far beyond double error, so
        // the rounded ordering is the exact ordering
        .select(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"),
          round(col("dec_rev").cast("double"), 6).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q6 shape: forecast-revenue — a PURE filter + scalar
    // aggregate over the fact table; every predicate must reach the
    // parquet scan (the pushdown showcase).
    "tpch_q6_forecast" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(
          sum((col("l_extendedprice").cast("decimal(18,4)") *
            col("l_discount").cast("decimal(18,4)"))
            .cast("decimal(18,4)")).as("dec_rev"),
          count(lit(1)).as("n_items"))
        .select(round(col("dec_rev").cast("double"), 6).as("revenue"),
          col("n_items"))),

    // TPC-H Q10 shape: top-20 customers by returned-item revenue in a
    // quarter — fact filter, two joins, grouped top-k
    // (TakeOrderedAndProject, never a global sort).
    "tpch_q10_returns" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val l = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      val n = Tables.nation(s, dir)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .withColumn("rev", (col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
          .cast("decimal(18,4)"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(col("rev")).as("dec_rev"))
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          round(col("dec_rev").cast("double"), 6).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q18 shape: large-volume orders — a grouped HAVING filter on
    // the fact table semi-joining back onto the order/customer detail.
    "tpch_q18_large_orders" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val big = l.groupBy(col("l_orderkey").as("__ok"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("__q"))
        .filter(col("__q") > lit(300).cast("decimal(18,4)"))
        .select(col("__ok"), round(col("__q").cast("double"), 6)
          .as("total_qty"))
      Tables.orders(s, dir)
        .join(big, col("o_orderkey") === col("__ok"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"),
          round(col("o_totalprice").cast("double"), 6).as("o_total"),
          col("total_qty"))
        .orderBy(col("o_total").desc, col("o_orderkey"))
        .limit(100)
    }),

    // TPC-H Q5 shape: revenue by nation for one region — the 5-way
    // dimension join with broadcast dims over the fact scan.
    "tpch_q5_region_volume" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      val sup = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .withColumn("rev", (col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
          .cast("decimal(18,4)"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev")).as("dec_rev"), count(lit(1)).as("n_items"))
        .select(col("n_name"),
          round(col("dec_rev").cast("double"), 6).as("revenue"),
          col("n_items"))
    }),

    // TPC-H Q21 shape: correlated EXISTS + NOT-EXISTS with an
    // INEQUALITY correlate (l2.l_suppkey <> l1.l_suppkey) — the sole
    // returned-line supplier in multi-supplier finished orders.
    // Expressed as a left-semi + left-anti hash/merge join pair on the
    // order key carrying the non-equi residual; PlanSpec pins that
    // neither decorrelation falls back to a nested-loop join.
    "tpch_q21_sole_returner" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val l1 = l.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_suppkey"))
      val l2 = l.select(col("l_orderkey").as("__ok2"),
        col("l_suppkey").as("__sk2"))
      val l3 = l.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("__ok3"), col("l_suppkey").as("__sk3"))
      val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"))
      l1.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(l2, col("l_orderkey") === col("__ok2") &&
          col("l_suppkey") =!= col("__sk2"), "left_semi")
        .join(l3, col("l_orderkey") === col("__ok3") &&
          col("l_suppkey") =!= col("__sk3"), "left_anti")
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
        .limit(25)
    }),

    // TPC-H Q19 shape: a DISJUNCTION of conjunctive brand/size/quantity
    // clauses spanning both join sides — the planner test is that the
    // part-only component of each disjunct still reaches the part scan
    // (CNF extraction) and the join stays a broadcast hash join with the
    // cross-side residual evaluated post-join, never a nested loop.
    "tpch_q19_disjunctive" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
      val cond =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey") && cond)
        .agg(sum((col("l_extendedprice").cast("decimal(18,4)") *
            (lit(1).cast("decimal(18,4)") -
              col("l_discount").cast("decimal(18,4)")))
            .cast("decimal(18,4)")).as("dec_rev"),
          count(lit(1)).as("n_lines"))
        .select(round(col("dec_rev").cast("double"), 6).as("revenue"),
          col("n_lines"))
    }),

    // TPC-H Q20 shape: an IN-subquery whose body is itself a grouped
    // HAVING aggregate over a dimension-filtered join — suppliers who
    // moved > 120 units of some 'small' part. Decorrelates to
    // aggregate -> left-semi hash join; the dimension broadcast-prunes
    // the fact scan before the aggregate.
    "tpch_q20_excess_suppliers" -> ((s, dir) => {
      val small = Tables.part(s, dir)
        .filter(col("p_name").startsWith("small"))
        .select(col("p_partkey"))
      val movers = Tables.lineitem(s, dir)
        .join(broadcast(small), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("l_quantity")).as("__q"))
        .filter(col("__q") > 120)
        .select(col("l_suppkey")).distinct()
      Tables.supplier(s, dir)
        .join(movers, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    }),

    // TPC-H Q22 shape: an UNCORRELATED scalar aggregate subquery (the
    // global positive-balance average — a one-row broadcast, never a
    // per-row re-evaluation) gating a filter, plus a NOT-EXISTS
    // anti join against orders. Completes the join-shape sweep:
    // semi (q18/q20), semi+anti with residual (q21), correlated scalar
    // (q17), disjunctive residual (q19), scalar + anti (here).
    "tpch_q22_idle_customers" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      // the threshold rides the 1e-6 grid so both engines compare
      // against an IDENTICAL scalar (the repo-wide determinism rule)
      val avgBal = c.filter(col("c_acctbal") > 0.0)
        .agg(round(avg(col("c_acctbal")), 6).as("__avg"))
      // "no order in the recent window" (the real q22 flavor): the date
      // predicate pushes into the orders scan BEFORE the anti join
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      c.join(broadcast(avgBal))
        .filter(col("c_acctbal") > col("__avg"))
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_custs"),
          round(sum(col("c_acctbal").cast("decimal(18,4)"))
            .cast("double"), 6).as("total_bal"))
    }),

    // TPC-H Q16 shape: DISTINCT-count rollup behind a NOT IN exclusion
    // subquery — the null-aware anti-join planner path (NOT IN over a
    // nullable key is NOT a plain anti join: one null in the subquery
    // legally empties the result, so Spark plans a null-aware variant).
    // Expressed in SQL deliberately to exercise spark.sql + subquery
    // planning end-to-end alongside the DataFrame-built shapes.
    "tpch_q16_supplier_counts" -> ((s, dir) => {
      Tables.part(s, dir).createOrReplaceTempView("g16_part")
      Tables.lineitem(s, dir).createOrReplaceTempView("g16_lineitem")
      Tables.supplier(s, dir).createOrReplaceTempView("g16_supplier")
      s.sql("""
        SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM g16_lineitem JOIN g16_part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#45'
          AND p_size IN (1, 4, 7, 10, 13, 16, 19, 23)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM g16_supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_size""")
    }),

    // TPC-H Q17 shape: correlated SCALAR subquery (per-part average
    // quantity) guarding a fact filter — decorrelated into a part-keyed
    // aggregate joined back onto the same filtered scan. The 0.2
    // threshold is applied as `5 * l_quantity < avg` so the comparison
    // is between EXACT doubles (integral quantities sum exactly; the
    // 0.2 literal never rounds) — engine-identical by construction.
    "tpch_q17_small_qty" -> ((s, dir) => {
      val p = Tables.part(s, dir).filter(col("p_brand") === "Brand#23")
        .select(col("p_partkey"))
      val lp = Tables.lineitem(s, dir)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      val avgq = lp.groupBy(col("l_partkey").as("__pk"))
        .agg(avg(col("l_quantity")).as("__avgq"))
      lp.join(avgq, col("l_partkey") === col("__pk"))
        .filter(col("l_quantity") * 5 < col("__avgq"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,4)"))
          .as("dec_sum"), count(lit(1)).as("n_lines"))
        .select(round(col("dec_sum").cast("double") / 7.0, 6)
          .as("avg_yearly"), col("n_lines"))
    })
  )

  val oracle: Map[String, String] = Map(

    "tpch_q1_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 6)
         |    AS sum_qty,
         |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 6)
         |    AS sum_base_price,
         |  round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
         |      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
         |      AS DECIMAL(18,4))) AS DOUBLE), 6) AS sum_disc_price,
         |  count(*) AS count_order,
         |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
         |        / count(*), 6) AS avg_qty
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '$Cut 00:00:00'
         |GROUP BY 1, 2""".stripMargin,

    "tpch_q3_priority" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
         |      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
         |      AS DECIMAL(18,4))) AS DOUBLE), 6) AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '$Cut 00:00:00'
         |  AND l_shipdate > TIMESTAMP '$Cut 00:00:00'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin,

    "tpch_q6_forecast" ->
      """SELECT
        |  round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |      CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(18,4)))
        |      AS DOUBLE), 6) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "tpch_q10_returns" ->
      """SELECT c_custkey, c_name, n_name,
        |  round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
        |      AS DECIMAL(18,4))) AS DOUBLE), 6) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "tpch_q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 6)
        |      AS total_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,4)))
        |         > CAST(300 AS DECIMAL(18,4)))
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate,
        |  round(CAST(o_totalprice AS DOUBLE), 6) AS o_total,
        |  total_qty
        |FROM orders
        |JOIN big ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_total DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    "tpch_q5_region_volume" ->
      """SELECT n_name,
        |  round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
        |      AS DECIMAL(18,4))) AS DOUBLE), 6) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1""".stripMargin,

    "tpch_q21_sole_returner" ->
      """SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s_suppkey
        |LIMIT 25""".stripMargin,

    "tpch_q16_supplier_counts" ->
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#45'
        |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 23)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_size""".stripMargin,

    "tpch_q22_idle_customers" ->
      """SELECT c_mktsegment, count(*) AS n_custs,
        |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 6)
        |    AS total_bal
        |FROM customer c
        |WHERE c_acctbal > (SELECT round(avg(c_acctbal), 6) FROM customer
        |                   WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c.c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY 1""".stripMargin,

    "tpch_q19_disjunctive" ->
      """SELECT
        |  round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
        |      AS DECIMAL(18,4))) AS DOUBLE), 6) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "tpch_q20_excess_suppliers" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  JOIN part ON p_partkey = l_partkey
        |  WHERE p_name LIKE 'small%'
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING sum(l_quantity) > 120)
        |ORDER BY s_suppkey""".stripMargin,

    "tpch_q17_small_qty" ->
      """SELECT
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
        |        AS DOUBLE) / 7.0, 6) AS avg_yearly,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#23'
        |  AND l_quantity * 5 < (SELECT avg(l2.l_quantity) FROM lineitem l2
        |                        WHERE l2.l_partkey = p_partkey)""".stripMargin
  )
}
