package graft.queries

import graft.Tables
import graft.ops.DataProfile
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

    // 2D skyline (pareto frontier) of parts minimizing (size, price):
    // the preference-query operator — no other part is both smaller
    // and cheaper (strictly in one). Aggregate-then-tiny-window shape
    // (Aggregations.skyline2D): the only window runs over the
    // size-cardinality relation, never the corpus; the oracle is the
    // quadratic NOT-EXISTS dominance check the operator exists to avoid
    "analytics_skyline" -> ((s, dir) =>
      graft.ops.Aggregations.skyline2D(
        Tables.part(s, dir).select(col("p_partkey"), col("p_size"),
          col("p_retailprice")),
        "p_size", "p_retailprice")),

    // group-wise skyline: an independent (size, price) frontier per
    // brand — the window partitions by brand, so the sort is per-brand
    // x-cardinality, never global
    "analytics_skyline_by_brand" -> ((s, dir) =>
      graft.ops.Aggregations.skyline2DBy(
        Tables.part(s, dir).select(col("p_brand"), col("p_partkey"),
          col("p_size"), col("p_retailprice")),
        Seq("p_brand"), "p_size", "p_retailprice")),

    // CONTINUOUS-x skyline (r18): x = retail price, distinct-x ~= the
    // row count — the regime that oracle-gates the DISTRIBUTED frontier
    // scan (coarse value-range buckets + broadcast cross-bucket prefix
    // mins; r17's single-partition window over distinct x died here)
    "analytics_skyline_price" -> ((s, dir) =>
      graft.ops.Aggregations.skyline2D(
        Tables.part(s, dir).select(col("p_partkey"), col("p_size"),
          col("p_retailprice")),
        "p_retailprice", "p_size")),

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
    }),

    // TPC-H Q4 shape: correlated EXISTS whose predicate compares columns
    // from BOTH sides (l_shipdate > o_orderdate + 60 days — the fixture
    // has no commit/receipt dates, so "late shipment" plays that role).
    // Decorrelates to a left-semi hash join on the order key with the
    // cross-side inequality riding as a residual — never a nested loop.
    "tpch_q4_priority_count" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      val l = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("__lok"), col("l_shipdate"))
      o.join(l, col("o_orderkey") === col("__lok") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // TPC-H Q12 shape: conditional (CASE) counting over a fact-fact join
    // — high/low-priority line counts per return flag (the fixture has no
    // l_shipmode; l_returnflag stands in as the grouping attribute, the
    // planner shape is identical). Both CASE branches fold into ONE
    // aggregation pass over the joined scan.
    "tpch_q12_priority_lines" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority"))
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy(col("l_returnflag"))
    }),

    // TPC-H Q13 shape: customer order-count distribution. The planner
    // trap is the filtered LEFT OUTER join — the priority predicate
    // belongs to the JOIN CONDITION (customers with zero qualifying
    // orders must survive with c_count = 0), not to a WHERE clause that
    // would silently turn the join inner. Double aggregation: per-customer
    // count, then the histogram of counts.
    "tpch_q13_order_distribution" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .filter(col("o_orderpriority") =!= "5-LOW")
        .select(col("o_custkey").as("__ck"), col("o_orderkey"))
      Tables.customer(s, dir)
        .join(o, col("c_custkey") === col("__ck"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q14 shape: promo-revenue share — a conditional-aggregate
    // RATIO over one joined scan; the part dimension broadcasts, both
    // sums come out of a single aggregation (no second pass / self-join).
    "tpch_q14_promo_share" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      val p = Tables.part(s, dir).select(col("p_partkey"), col("p_type"))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .withColumn("rev", (col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
          .cast("decimal(18,4)"))
        .agg(
          sum(when(col("p_type") === "PROMO", col("rev"))
            .otherwise(lit(0).cast("decimal(18,4)"))).as("dec_promo"),
          sum(col("rev")).as("dec_total"))
        .select(
          round(lit(100.0) * col("dec_promo").cast("double") /
            col("dec_total").cast("double"), 6).as("promo_share"),
          round(col("dec_total").cast("double"), 6).as("total_revenue"))
    }),

    // TPC-H Q15 shape: top supplier by quarterly revenue — an aggregate
    // compared against the MAX over the SAME aggregate (scalar-subquery
    // equality). The decimal revenue is compared EXACTLY (decimal sums
    // are exact in both engines), so ties are kept identically; the max
    // is a one-row broadcast, never a re-aggregation per row.
    "tpch_q15_top_supplier" -> ((s, dir) => {
      // the explicit isNotNull keeps the shared aggregate subtree
      // canonically IDENTICAL under both consumers (the later inner join
      // would push a null filter into only the probe side otherwise),
      // which is what lets ReuseExchange compute the aggregate once
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp") &&
          col("l_suppkey").isNotNull)
        .withColumn("r", (col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
          .cast("decimal(18,4)"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("r")).as("dec_rev"))
      val mx = rev.agg(max(col("dec_rev")).as("__max"))
      rev.join(broadcast(mx), col("dec_rev") === col("__max"))
        .join(broadcast(Tables.supplier(s, dir)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          round(col("dec_rev").cast("double"), 6).as("total_rev"))
        .orderBy(col("s_suppkey"))
    }),

    // TPC-H Q7 shape: cross-nation shipping volume between two trading
    // partners by year. The nation pair filter is pushed into the
    // supplier/customer DIMENSIONS before they touch the fact join (a
    // 2/25 prune ahead of the shuffle); the asymmetric-pair condition
    // reduces to supp_nation <> cust_nation once both sides are limited
    // to the two nations.
    "tpch_q7_nation_volume" -> ((s, dir) => {
      val nations = Seq("NATION_1", "NATION_2")
      val n1 = Tables.nation(s, dir)
        .filter(col("n_name").isin(nations: _*))
      val sn = Tables.supplier(s, dir)
        .join(broadcast(n1), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, dir)
        .filter(col("n_name").isin(nations: _*))
        .select(col("n_nationkey").as("__nk2"), col("n_name").as("cust_nation"))
      val cn = Tables.customer(s, dir)
        .join(broadcast(n2), col("c_nationkey") === col("__nk2"))
        .select(col("c_custkey"), col("cust_nation"))
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      l.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(cn, col("o_custkey") === col("c_custkey"))
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .withColumn("rev", (col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
          .cast("decimal(18,4)"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(col("rev")).cast("double"), 6).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // TPC-H Q8 shape: market share — the fraction of a year's regional
    // import revenue supplied by one nation, i.e. a conditional sum over
    // the total sum from ONE aggregation pass. Customer region membership
    // is a left-semi join (only existence matters); part/supplier/nation
    // dimensions broadcast.
    "tpch_q8_market_share" -> ((s, dir) => {
      val amerNations = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val amerCust = Tables.customer(s, dir)
        .join(broadcast(amerNations), col("c_nationkey") === col("n_nationkey"),
          "left_semi")
        .select(col("c_custkey"))
      val sn = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val p = Tables.part(s, dir).filter(col("p_type") === "ECONOMY")
        .select(col("p_partkey"))
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      Tables.lineitem(s, dir)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(amerCust, col("o_custkey") === col("c_custkey"), "left_semi")
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .withColumn("rev", (col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
          .cast("decimal(18,4)"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          round(sum(when(col("supp_nation") === "NATION_5", col("rev"))
              .otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
            sum(col("rev")).cast("double"), 6).as("mkt_share"),
          round(sum(col("rev")).cast("double"), 6).as("total_rev"))
        .orderBy(col("o_year"))
    }),

    // TPC-H Q9 shape: product profit by supplier nation and year. The
    // fixture has no partsupp/ps_supplycost, so cost is proxied by
    // p_retailprice * l_quantity — the ARITHMETIC shape (per-line profit
    // = revenue minus a part-priced cost, aggregated over a LIKE-filtered
    // part dimension) is q9's. All money math stays in decimals: each
    // product is one (18,4)x(18,4) multiply with a narrowing cast (exact,
    // the q1 convention), so the grouped sums are engine-exact.
    "tpch_q9_product_profit" -> ((s, dir) => {
      val p = Tables.part(s, dir).filter(col("p_name").startsWith("red"))
        .select(col("p_partkey"), col("p_retailprice"))
      val sn = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      Tables.lineitem(s, dir)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .withColumn("amount",
          (col("l_extendedprice").cast("decimal(18,4)") *
            (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
            .cast("decimal(18,4)") -
          (col("p_retailprice").cast("decimal(18,4)") *
            col("l_quantity").cast("decimal(18,4)")).cast("decimal(18,4)"))
        .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
        .agg(round(sum(col("amount")).cast("double"), 6).as("sum_profit"))
        .orderBy(col("n_name"), col("o_year").desc)
    }),

    // TPC-H Q11 shape: grouped aggregate gated by a FRACTION of the
    // global aggregate over the same input — the scalar subquery is a
    // one-row broadcast multiplied into the HAVING threshold, and the
    // comparison stays in exact decimals on both engines. (The fixture
    // has no partsupp; customer balances by nation carry the shape.)
    "tpch_q11_important_balances" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
        .withColumn("bal", col("c_acctbal").cast("decimal(18,4)"))
      val byNation = c
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("bal")).as("dec_val"))
      val total = c.agg((sum(col("bal")) *
        lit(0.04).cast("decimal(6,4)")).as("__threshold"))
      byNation.join(broadcast(total))
        .filter(col("dec_val") > col("__threshold"))
        .select(col("n_name"),
          round(col("dec_val").cast("double"), 6).as("total_bal"))
        .orderBy(col("total_bal").desc)
    }),

    // TPC-H Q2 shape: minimum-cost supplier per part — a correlated
    // scalar MIN decorrelated into a per-part aggregate equality-joined
    // back onto the candidate set, over a region-filtered dimension
    // chain. The fixture has no partsupp, so the part↔supplier relation
    // is the DISTINCT (l_partkey, l_suppkey) bridge from lineitem and
    // the minimized attribute is s_acctbal; min/equality on stored
    // doubles is exact (both engines read identical bits), and ties are
    // kept identically.
    "tpch_q2_min_balance_supplier" -> ((s, dir) => {
      val eur = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val es = Tables.supplier(s, dir)
        .join(broadcast(eur), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
      val pairs = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val p = Tables.part(s, dir).filter(col("p_size") === 15)
        .select(col("p_partkey"), col("p_name"))
      val cand = p.join(pairs, col("p_partkey") === col("l_partkey"))
        .join(broadcast(es), col("l_suppkey") === col("s_suppkey"))
      val minb = cand.groupBy(col("p_partkey").as("__pk"))
        .agg(min(col("s_acctbal")).as("__minbal"))
      cand.join(minb, col("p_partkey") === col("__pk") &&
          col("s_acctbal") === col("__minbal"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_name"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),

    // Multi-column profiler (DESCRIBE surface), served by the
    // SPLIT-distinct face: the one-agg form's multiple countDistincts
    // make Catalyst Expand every row once per distinct — a 6x corpus
    // shuffle (measured 10.6 s vs ~3 s here; fatal at 100 TB). Each
    // distinct count instead runs as its own single-column pruned scan
    // with the partial-distinct rewrite (shuffles only distinct
    // values); on a columnar table six one-column scans read the same
    // bytes as one full-width scan. profileSplit == profile is
    // spec-pinned.
    "stats_profile_lineitem" -> ((s, dir) =>
      DataProfile.profileSplit(Tables.lineitem(s, dir),
        Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount",
          "l_returnflag", "l_linestatus"))),

    // Pivot (crosstab) — per-nation counts spread over order priorities.
    // The values list is EXPLICIT: at 100 TB, pivot without values runs
    // a blocking collect-distinct over the pivot column before the real
    // job; with values it is one Expand-free aggregation pass.
    "events_pivot_priority" -> ((s, dir) =>
      Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)
          .join(broadcast(Tables.nation(s, dir)),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("n_name"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .select(col("n_name"),
          coalesce(col("1-URGENT"), lit(0L)).as("urgent"),
          coalesce(col("2-HIGH"), lit(0L)).as("high"),
          coalesce(col("3-MEDIUM"), lit(0L)).as("medium"),
          coalesce(col("4-NOT SPECIFIED"), lit(0L)).as("unspecified"),
          coalesce(col("5-LOW"), lit(0L)).as("low"))),

    // Set operations with bag semantics — INTERSECT (customers active in
    // BOTH years) and EXCEPT (active in 1996 but gone by 1997): the
    // dedicated set-op planner paths (both rewrite to aggregated
    // semi/anti joins, never a loop), distinct from the semi-join
    // family the TPC-H sweep covers.
    "setop_customer_churn" -> ((s, dir) => {
      def active(yr: Int) = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit(s"$yr-01-01").cast("timestamp") &&
          col("o_orderdate") < lit(s"${yr + 1}-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      val retained = active(1996).intersect(active(1997))
        .select(col("o_custkey"), lit("retained").as("cohort"))
      val churned = active(1996).except(active(1997))
        .select(col("o_custkey"), lit("churned").as("cohort"))
      retained.unionByName(churned)
    })
  )

  /** Oracle row for one profiled column (see [[DataProfile.profile]]). */
  private def profileOracleRow(c: String, numeric: Boolean): String =
    if (numeric)
      s"""SELECT '$c' AS col_name, count(*) AS n,
         |  count(*) - count($c) AS n_null,
         |  count(DISTINCT $c) AS n_distinct,
         |  round(CAST(min($c) AS DOUBLE), 6) AS min_num,
         |  round(CAST(max($c) AS DOUBLE), 6) AS max_num,
         |  round(CAST(sum(CAST($c AS DECIMAL(18,4))) AS DOUBLE)
         |        / count($c), 6) AS mean,
         |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
         |FROM lineitem""".stripMargin
    else
      s"""SELECT '$c' AS col_name, count(*) AS n,
         |  count(*) - count($c) AS n_null,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
         |  CAST(NULL AS DOUBLE) AS mean,
         |  min($c) AS min_str, max($c) AS max_str
         |FROM lineitem""".stripMargin

  val oracle: Map[String, String] = Map(

    // brute-force dominance: r survives iff nothing is <= on both dims
    // and < on at least one
    "analytics_skyline" ->
      """SELECT p_size, p_partkey, p_retailprice
        |FROM part r
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part d
        |  WHERE d.p_size <= r.p_size
        |    AND d.p_retailprice <= r.p_retailprice
        |    AND (d.p_size < r.p_size
        |      OR d.p_retailprice < r.p_retailprice))""".stripMargin,

    "analytics_skyline_by_brand" ->
      """SELECT p_brand, p_size, p_partkey, p_retailprice
        |FROM part r
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part d
        |  WHERE d.p_brand = r.p_brand
        |    AND d.p_size <= r.p_size
        |    AND d.p_retailprice <= r.p_retailprice
        |    AND (d.p_size < r.p_size
        |      OR d.p_retailprice < r.p_retailprice))""".stripMargin,

    "analytics_skyline_price" ->
      """SELECT p_partkey, p_size, p_retailprice
        |FROM part r
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part d
        |  WHERE d.p_retailprice <= r.p_retailprice
        |    AND d.p_size <= r.p_size
        |    AND (d.p_retailprice < r.p_retailprice
        |      OR d.p_size < r.p_size))""".stripMargin,

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
        |                        WHERE l2.l_partkey = p_partkey)""".stripMargin,

    "tpch_q4_priority_count" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1""".stripMargin,

    "tpch_q12_priority_lines" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1""".stripMargin,

    "tpch_q13_order_distribution" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |      GROUP BY 1)
        |GROUP BY 1""".stripMargin,

    "tpch_q14_promo_share" ->
      """WITH j AS (
        |  SELECT p_type,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
        |      AS DECIMAL(18,4)) AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00')
        |SELECT
        |  round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev
        |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
        |    CAST(sum(rev) AS DOUBLE), 6) AS promo_share,
        |  round(CAST(sum(rev) AS DOUBLE), 6) AS total_revenue
        |FROM j""".stripMargin,

    "tpch_q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
        |      AS DECIMAL(18,4))) AS dec_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name,
        |  round(CAST(dec_rev AS DOUBLE), 6) AS total_rev
        |FROM rev JOIN supplier ON s_suppkey = l_suppkey
        |WHERE dec_rev = (SELECT max(dec_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "tpch_q7_nation_volume" ->
      """SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
        |      AS DECIMAL(18,4))) AS DOUBLE), 6) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ns ON s_nationkey = ns.n_nationkey
        |JOIN nation nc ON c_nationkey = nc.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        |    OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3""".stripMargin,

    "tpch_q8_market_share" ->
      """WITH j AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS o_year, n.n_name AS supp_nation,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
        |      AS DECIMAL(18,4)) AS rev
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n ON s_nationkey = n.n_nationkey
        |  WHERE p_type = 'ECONOMY'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |    AND EXISTS (
        |      SELECT 1 FROM customer
        |      JOIN nation nc ON c_nationkey = nc.n_nationkey
        |      JOIN region ON nc.n_regionkey = r_regionkey
        |      WHERE c_custkey = o_custkey AND r_name = 'AMERICA'))
        |SELECT o_year,
        |  round(CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN rev
        |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
        |    CAST(sum(rev) AS DOUBLE), 6) AS mkt_share,
        |  round(CAST(sum(rev) AS DOUBLE), 6) AS total_rev
        |FROM j GROUP BY 1""".stripMargin,

    "tpch_q9_product_profit" ->
      """SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
        |  round(CAST(sum(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
        |      AS DECIMAL(18,4)) -
        |    CAST(CAST(p_retailprice AS DECIMAL(18,4)) *
        |      CAST(l_quantity AS DECIMAL(18,4)) AS DECIMAL(18,4))
        |  ) AS DOUBLE), 6) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE 'red%'
        |GROUP BY 1, 2""".stripMargin,

    "tpch_q11_important_balances" ->
      """SELECT n_name,
        |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 6)
        |    AS total_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1
        |HAVING sum(CAST(c_acctbal AS DECIMAL(18,4))) >
        |  (SELECT sum(CAST(c_acctbal AS DECIMAL(18,4))) *
        |     CAST(0.04 AS DECIMAL(6,4)) FROM customer)""".stripMargin,

    "tpch_q2_min_balance_supplier" ->
      """WITH pairs AS (
        |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |cand AS (
        |  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
        |  FROM part
        |  JOIN pairs ON p_partkey = l_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE p_size = 15 AND r_name = 'EUROPE')
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
        |FROM cand c
        |WHERE s_acctbal = (SELECT min(s_acctbal) FROM cand c2
        |                   WHERE c2.p_partkey = c.p_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "events_pivot_priority" ->
      """SELECT n_name,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
        |  CAST(sum(CASE WHEN o_orderpriority = '2-HIGH'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high,
        |  CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS medium,
        |  CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS unspecified,
        |  CAST(sum(CASE WHEN o_orderpriority = '5-LOW'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin,

    "setop_customer_churn" ->
      """WITH a96 AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
        |a97 AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
        |SELECT o_custkey, 'retained' AS cohort
        |FROM (SELECT o_custkey FROM a96 INTERSECT SELECT o_custkey FROM a97)
        |UNION ALL
        |SELECT o_custkey, 'churned' AS cohort
        |FROM (SELECT o_custkey FROM a96 EXCEPT SELECT o_custkey FROM a97)""".stripMargin,

    "stats_profile_lineitem" -> Seq(
      "l_orderkey" -> true, "l_quantity" -> true, "l_extendedprice" -> true,
      "l_discount" -> true, "l_returnflag" -> false, "l_linestatus" -> false)
      .map { case (c, num) => profileOracleRow(c, num) }
      .mkString("", "\nUNION ALL\n", "")
  )
}
