package graft.queries

import graft.Tables
import graft.ops.{CountMin, DataProfile, EventOps, Graph}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical-analysis and attribution queries — the "data science on
  * the warehouse" surface: one-pass correlation/regression moments,
  * distribution histograms (equi-width and a sort-free equi-depth CDF),
  * and marketing attribution over the events stream.
  *
  * Determinism across engines follows the repo convention: every
  * accumulation that feeds a float result is an EXACT decimal sum, and
  * the closed-form float arithmetic afterwards is the same fixed
  * sequence of IEEE ops in both engines (see [[DataProfile.corrMatrix]]).
  */
object StatsQueries {

  private val Touches = Seq("click", "view")
  private val Lookback = 72 // hours

  val queries: Map[String, Query] = Map(

    // first/last-touch attribution per conversion: one user-keyed range
    // window, never a conversion x touch pair join
    "events_attribution" -> ((s, dir) =>
      EventOps.attribution(Tables.events(s, dir), "purchase",
        Touches, Lookback)),

    // linear (fractional) credit rolled up per channel
    "events_attribution_credit" -> ((s, dir) =>
      EventOps.attributionCredit(Tables.events(s, dir), "purchase",
        Touches, Lookback)),

    // pairwise Pearson correlation over the fact table's numeric
    // columns from ONE aggregation pass
    "stats_corr_matrix" -> ((s, dir) =>
      DataProfile.corrMatrix(Tables.lineitem(s, dir),
        Seq("l_quantity", "l_extendedprice", "l_discount"))),

    // per-returnflag OLS of extendedprice on quantity (slope/intercept/
    // r-squared in closed form from exact moment sums)
    "stats_regression" -> ((s, dir) =>
      DataProfile.regression(Tables.lineitem(s, dir), "l_returnflag",
        "l_quantity", "l_extendedprice")),

    // fixed-bounds equi-width histogram of the price distribution
    "stats_hist_width" -> ((s, dir) =>
      DataProfile.equiWidthHistogram(Tables.lineitem(s, dir),
        "l_extendedprice", 0L, 120000L, 24)),

    // exact equi-depth (decile) histogram WITHOUT a global sort — the
    // distributed-CDF formulation (see DataProfile.equiDepthHistogram)
    "stats_hist_depth" -> ((s, dir) =>
      DataProfile.equiDepthHistogram(Tables.lineitem(s, dir),
        "l_extendedprice", 0L, 120000L, 10)),

    // EXACT quantiles from the distributed CDF — no global sort, no
    // percentile() group buffer; integer rank arithmetic end-to-end
    "stats_quantiles" -> ((s, dir) =>
      DataProfile.quantilesExact(Tables.lineitem(s, dir),
        "l_extendedprice", 0L, 120000L, Seq(25, 50, 75, 90, 99))),

    // Poisson bootstrap CI of the per-type mean event value: 32
    // deterministic hash-weighted resamples in ONE map-only pass —
    // the bootstrap that works when drawing n rows with replacement
    // would be a global shuffle per resample (the oracle replays the
    // identical md5-uniform -> Poisson(1) inverse-CDF weights)
    "stats_bootstrap_ci" -> ((s, dir) =>
      DataProfile.poissonBootstrapCi(Tables.events(s, dir),
        "event_type", "value", "event_id", b = 32)),

    // A/B difference CI — the bootstrap's real job: uncertainty of the
    // click-vs-view mean-value CONTRAST from PAIRED resamples (same
    // resample index on both arms; two marginal CIs would overstate
    // the interval by ignoring the shared resampling noise)
    "stats_ab_diff_ci" -> ((s, dir) => {
      val m = DataProfile.poissonBootstrapMeans(
        Tables.events(s, dir)
          .filter(col("event_type").isin("click", "view")),
        "event_type", "value", "event_id", b = 32)
      val diff = m.filter(col("event_type") === "click")
        .select(col("resample"), col("mean").as("mc"))
        .join(m.filter(col("event_type") === "view")
          .select(col("resample"), col("mean").as("mv")), Seq("resample"))
        .select(col("resample"), round(col("mc") - col("mv"), 6).as("diff"))
      DataProfile.orderStatCi(diff, Seq.empty, "diff", 32)
        .withColumnRenamed("stat_diff", "diff_mean")
    }),

    // Count-Min sketch build over the event-actor stream — the DuckDB
    // oracle rebuilds the IDENTICAL counter table (md5 buckets)
    "sketch_countmin" -> ((s, dir) =>
      CountMin.build(Tables.events(s, dir), "user_id")),

    // per-key point queries against the sketch, with the one-sided
    // guarantee emitted as a gated fact: est >= exact for EVERY key
    "sketch_countmin_estimate" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact_n"))
      val est = CountMin.estimate(exact.select("user_id"), "user_id",
        CountMin.build(ev, "user_id"))
      exact.join(est, "user_id")
        .select(col("user_id"), col("exact_n"), col("est"),
          (col("est") >= col("exact_n")).as("ok"))
    }),

    // time-weighted average value per (type, day): each reading is
    // weighted by the seconds it was "current" (until the next reading
    // of the same type that day; the last holds to midnight). The
    // window partitions by (type, day) — bounded state, never one task
    // per type — and the weighted sum accumulates as exact decimal.
    "events_twap" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          unix_timestamp(col("ts")).as("tsec"), col("value"))
        .withColumn("day", floor(col("tsec") / 86400).cast("long"))
      val w = Window.partitionBy(col("event_type"), col("day"))
        .orderBy(col("tsec"), col("event_id"))
      ev.withColumn("nxt",
          coalesce(lead(col("tsec"), 1).over(w), (col("day") + 1) * 86400))
        .withColumn("wt", col("nxt") - col("tsec"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"),
          sum(col("wt")).as("total_sec"),
          round(sum((col("value").cast("decimal(18,4)") *
              col("wt").cast("decimal(18,4)")).cast("decimal(38,8)"))
            .cast("double") /
            sum(col("wt")).cast("double"), 6).as("twap"))
    }),

    // inter-arrival-time distribution per (type, day): gaps between
    // consecutive events, fixed 60 s buckets capped at an hour — the
    // latency-profile view of the stream
    "events_interarrival_hist" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          unix_timestamp(col("ts")).as("tsec"))
        .withColumn("day", floor(col("tsec") / 86400).cast("long"))
      val w = Window.partitionBy(col("event_type"), col("day"))
        .orderBy(col("tsec"), col("event_id"))
      ev.withColumn("gap", col("tsec") - lag(col("tsec"), 1).over(w))
        .filter(col("gap").isNotNull)
        .groupBy(col("event_type"),
          least(floor(col("gap") / 60), lit(59L)).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n"),
          max(col("gap")).as("max_gap_sec"))
    }),

    // referential-integrity audit across the star schema: orphan
    // foreign keys per relationship in one pass each (anti joins; the
    // dimension side broadcasts). The report every warehouse load
    // gate runs before publishing.
    "quality_ref_integrity" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      def audit(name: String, fact: org.apache.spark.sql.DataFrame,
          fk: String, dim: org.apache.spark.sql.DataFrame, pk: String) = {
        val orphans = fact.join(broadcast(dim.select(col(pk))),
          fact(fk) === col(pk), "left_anti")
        orphans.agg(count(lit(1)).as("n_orphans"))
          .select(lit(name).as("relationship"), col("n_orphans"))
      }
      audit("lineitem->orders", li, "l_orderkey",
          o.select(col("o_orderkey")), "o_orderkey")
        .unionByName(audit("lineitem->part", li, "l_partkey",
          Tables.part(s, dir), "p_partkey"))
        .unionByName(audit("lineitem->supplier", li, "l_suppkey",
          Tables.supplier(s, dir), "s_suppkey"))
        .unionByName(audit("orders->customer", o, "o_custkey",
          Tables.customer(s, dir), "c_custkey"))
        .unionByName(audit("customer->nation", Tables.customer(s, dir),
          "c_nationkey", Tables.nation(s, dir), "n_nationkey"))
    }),

    // per-customer running revenue over their order history — the
    // cumulative-window shape (customer-partitioned, exact decimal
    // accumulation; the frame never spans customers)
    "analytics_running_revenue" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice").cast("decimal(18,4)").as("p"))
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.withColumn("order_seq", row_number().over(
          Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_orderdate"), col("o_orderkey"))))
        .withColumn("cum_rev", round(sum(col("p")).over(w)
          .cast("double"), 6))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("order_seq"), round(col("p").cast("double"), 6).as("price"),
          col("cum_rev"))
    }),

    // the transaction-log table end-to-end: overwrite, append, a bad
    // overwrite, rollback — the final read must see exactly the v2
    // content (view + click events), with no data ever copied
    "events_versioned_rollback" -> ((s, dir) => {
      import graft.pipeline.VersionedTable
      val root = ParityQueries.scratch("events_vt")
      val fs = org.apache.hadoop.fs.FileSystem
        .get(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      VersionedTable.commit(s, ev.filter(col("event_type") === "view"), root)
      VersionedTable.append(s, ev.filter(col("event_type") === "click"), root)
      VersionedTable.commit(s, ev.filter(col("event_type") === "error"), root)
      VersionedTable.rollback(s, root, to = 2)
      VersionedTable.read(s, root)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))
    }),

    // PageRank over the symmetrized customer-supplier trade graph —
    // the iterative join+aggregate pattern with per-round lineage cuts
    "graph_pagerank" -> ((s, dir) => {
      val pairs = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
        .distinct()
      val fwd = pairs.select(concat(lit("c"), col("ck")).as("src"),
        concat(lit("s"), col("sk")).as("dst"))
      val rev = pairs.select(concat(lit("s"), col("sk")).as("src"),
        concat(lit("c"), col("ck")).as("dst"))
      Graph.pagerank(fwd.unionByName(rev), iterations = 8)
    })
  )

  /** 32-bit integer from the first 8 hex digits of `hexExpr` — the
    * per-digit strpos polynomial (DuckDB has no hex->int conv), the
    * LlmQueries convention restated for the sketch oracles.
    */
  private def hex8(hexExpr: String): String = {
    val terms = (0 until 8).map { j =>
      val pow = 1L << (4 * (7 - j))
      s"(strpos('0123456789abcdef', substr($hexExpr, ${j + 1}, 1)) - 1) * $pow"
    }.mkString(" + ")
    s"($terms)"
  }

  /** The CMS cell set per (hash row, key) — shared by both sketch
    * oracles. `rel` must expose a `user_id` column.
    */
  private def cmsCells(rel: String): String =
    s"""SELECT i, user_id,
       |  ${hex8("md5(concat_ws('|', CAST(i AS VARCHAR), " +
                 "CAST(user_id AS VARCHAR)))")} % 2048 AS bucket
       |FROM $rel CROSS JOIN range(5) t(i)""".stripMargin

  /** The unrolled PageRank recurrence (the same 1e-12-gridded decimal
    * accumulation as [[Graph.pagerank]]) over the customer-supplier
    * trade graph.
    */
  private def pagerankSql(iterations: Int): String = {
    val steps = (1 to iterations).map { k =>
      s"""pr$k AS (SELECT d.src AS node,
         |  round(0.15 + 0.85 * CAST(coalesce(c.s,
         |    CAST(0 AS DECIMAL(38,12))) AS DOUBLE), 12) AS rank
         |  FROM deg d LEFT JOIN (
         |    SELECT e.dst AS dst,
         |      sum(CAST(round(p.rank / dd.deg, 12) AS DECIMAL(28,12))) AS s
         |    FROM pr${k - 1} p
         |    JOIN edges e ON e.src = p.node
         |    JOIN deg dd ON dd.src = p.node
         |    GROUP BY 1) c ON c.dst = d.src)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (SELECT DISTINCT o_custkey AS ck, l_suppkey AS sk
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |edges AS (
       |  SELECT 'c' || CAST(ck AS VARCHAR) AS src,
       |         's' || CAST(sk AS VARCHAR) AS dst FROM pairs
       |  UNION ALL
       |  SELECT 's' || CAST(sk AS VARCHAR) AS src,
       |         'c' || CAST(ck AS VARCHAR) AS dst FROM pairs),
       |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
       |pr0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) AS rank FROM deg),
       |$steps
       |SELECT node, round(rank, 6) AS rank FROM pr$iterations""".stripMargin
  }

  /** First-8-hex-digits-of-md5 → 32-bit integer polynomial (DuckDB has
    * no hex→int conversion; the [[LlmQueries]] convention).
    */
  private def hex8Sql(hexExpr: String): String = {
    val terms = (0 until 8).map { j =>
      val pow = 1L << (4 * (7 - j))
      s"(strpos('0123456789abcdef', substr($hexExpr, ${j + 1}, 1)) - 1) * $pow"
    }.mkString(" +\n           ")
    s"($terms)"
  }

  val oracle: Map[String, String] = Map(

    "stats_bootstrap_ci" -> {
      val wSql = graft.ops.DataProfile.PoissonCdf
        .map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)")
        .mkString(" +\n        ")
      s"""WITH r AS (SELECT event_type, CAST(value AS DOUBLE) AS v,
         |    CAST(event_id AS VARCHAR) AS id, b
         |  FROM events, unnest(range(0, 32)) t(b)),
         |h AS (SELECT event_type, v, b,
         |    ${hex8Sql("md5(id || ':' || CAST(b AS VARCHAR))")}
         |      / 4294967296.0 AS u
         |  FROM r),
         |wt AS (SELECT event_type, v, b,
         |    ($wSql) AS w
         |  FROM h),
         |m AS (SELECT event_type, b,
         |    round(sum(w * v) / sum(w), 6) AS m
         |  FROM wt GROUP BY 1, 2 HAVING sum(w) > 0),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY event_type
         |    ORDER BY m, b) AS rn,
         |  count(*) OVER (PARTITION BY event_type) AS nb FROM m)
         |SELECT event_type, round(avg(m), 6) AS boot_mean,
         |  max(CASE WHEN rn = 2 AND nb >= 4 THEN m END) AS ci_lo,
         |  max(CASE WHEN rn = nb - 1 AND nb >= 4 THEN m END) AS ci_hi,
         |  CAST(count(*) AS INT) AS n_resamples
         |FROM rk GROUP BY 1""".stripMargin
    },

    "stats_ab_diff_ci" -> {
      val wSql = graft.ops.DataProfile.PoissonCdf
        .map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)")
        .mkString(" +\n        ")
      s"""WITH r AS (SELECT event_type, CAST(value AS DOUBLE) AS v,
         |    CAST(event_id AS VARCHAR) AS id, b
         |  FROM events, unnest(range(0, 32)) t(b)
         |  WHERE event_type IN ('click', 'view')),
         |h AS (SELECT event_type, v, b,
         |    ${hex8Sql("md5(id || ':' || CAST(b AS VARCHAR))")}
         |      / 4294967296.0 AS u
         |  FROM r),
         |wt AS (SELECT event_type, v, b,
         |    ($wSql) AS w
         |  FROM h),
         |m AS (SELECT event_type, b,
         |    round(sum(w * v) / sum(w), 6) AS m
         |  FROM wt GROUP BY 1, 2 HAVING sum(w) > 0),
         |d AS (SELECT mc.b AS resample, round(mc.m - mv.m, 6) AS diff
         |  FROM (SELECT b, m FROM m WHERE event_type = 'click') mc
         |  JOIN (SELECT b, m FROM m WHERE event_type = 'view') mv
         |    ON mc.b = mv.b),
         |rk AS (SELECT *, row_number() OVER (ORDER BY diff, resample)
         |    AS rn,
         |  count(*) OVER () AS nb FROM d)
         |SELECT round(avg(diff), 6) AS diff_mean,
         |  max(CASE WHEN rn = 2 AND nb >= 4 THEN diff END) AS ci_lo,
         |  max(CASE WHEN rn = nb - 1 AND nb >= 4 THEN diff END) AS ci_hi,
         |  CAST(count(*) AS INT) AS n_resamples
         |FROM rk""".stripMargin
    },

    "events_attribution" ->
      s"""WITH base AS (SELECT event_id, user_id, event_type,
         |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS tsec
         |  FROM events),
         |conv AS (SELECT event_id, user_id, tsec FROM base
         |         WHERE event_type = 'purchase'),
         |touch AS (SELECT user_id, event_type, tsec FROM base
         |          WHERE event_type IN ('click', 'view')),
         |pairs AS (
         |  SELECT c.event_id, t.event_type AS tt, t.tsec AS tts
         |  FROM conv c JOIN touch t ON t.user_id = c.user_id
         |    AND t.tsec <= c.tsec AND t.tsec >= c.tsec - ${Lookback * 3600}),
         |ranked AS (
         |  SELECT event_id, tt, tts,
         |    row_number() OVER (PARTITION BY event_id
         |                       ORDER BY tts, tt) AS rf,
         |    row_number() OVER (PARTITION BY event_id
         |                       ORDER BY tts DESC, tt DESC) AS rl,
         |    count(*) OVER (PARTITION BY event_id) AS nt
         |  FROM pairs)
         |SELECT c.event_id AS conv_event_id, c.user_id,
         |  c.tsec AS conv_tsec,
         |  f.tt AS first_touch, f.tts AS first_touch_tsec,
         |  l.tt AS last_touch, l.tts AS last_touch_tsec,
         |  coalesce(f.nt, 0) AS n_touches
         |FROM conv c
         |LEFT JOIN ranked f ON f.event_id = c.event_id AND f.rf = 1
         |LEFT JOIN ranked l ON l.event_id = c.event_id AND l.rl = 1""".stripMargin,

    "events_attribution_credit" ->
      s"""WITH base AS (SELECT event_id, user_id, event_type,
         |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS tsec
         |  FROM events),
         |conv AS (SELECT event_id, user_id, tsec FROM base
         |         WHERE event_type = 'purchase'),
         |touch AS (SELECT user_id, event_type, tsec FROM base
         |          WHERE event_type IN ('click', 'view')),
         |pc AS (
         |  SELECT c.event_id,
         |    CAST(sum(CASE WHEN t.event_type = 'click' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_click,
         |    CAST(sum(CASE WHEN t.event_type = 'view' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_view
         |  FROM conv c LEFT JOIN touch t ON t.user_id = c.user_id
         |    AND t.tsec <= c.tsec AND t.tsec >= c.tsec - ${Lookback * 3600}
         |  GROUP BY 1)
         |SELECT 'click' AS channel,
         |  round(CAST(sum(CAST(CASE WHEN n_click + n_view > 0
         |    THEN round(CAST(n_click AS DOUBLE) / (n_click + n_view), 12)
         |    ELSE 0.0 END AS DECIMAL(28,12))) AS DOUBLE), 6) AS credit,
         |  CAST(sum(CASE WHEN n_click > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_convs_touched
         |FROM pc
         |UNION ALL
         |SELECT 'view' AS channel,
         |  round(CAST(sum(CAST(CASE WHEN n_click + n_view > 0
         |    THEN round(CAST(n_view AS DOUBLE) / (n_click + n_view), 12)
         |    ELSE 0.0 END AS DECIMAL(28,12))) AS DOUBLE), 6) AS credit,
         |  CAST(sum(CASE WHEN n_view > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_convs_touched
         |FROM pc""".stripMargin,

    "stats_corr_matrix" -> {
      val pairs = Seq(
        ("l_quantity", "l_extendedprice"),
        ("l_quantity", "l_discount"),
        ("l_extendedprice", "l_discount"))
      val pre =
        """WITH complete AS (SELECT l_quantity, l_extendedprice, l_discount
          |  FROM lineitem WHERE l_quantity IS NOT NULL
          |    AND l_extendedprice IS NOT NULL AND l_discount IS NOT NULL),
          |m AS (SELECT count(*) AS nn, CAST(count(*) AS DOUBLE) AS n,""".stripMargin
      def sums(c: String, tag: String) =
        s"""  CAST(sum(CAST($c AS DECIMAL(38,8))) AS DOUBLE) AS s_$tag,
           |  CAST(sum(CAST(CAST($c AS DECIMAL(19,4)) * CAST($c AS DECIMAL(19,4))
           |    AS DECIMAL(38,8))) AS DOUBLE) AS ss_$tag""".stripMargin
      def prod(a: String, b: String, ta: String, tb: String) =
        s"""  CAST(sum(CAST(CAST($a AS DECIMAL(19,4)) * CAST($b AS DECIMAL(19,4))
           |    AS DECIMAL(38,8))) AS DOUBLE) AS sp_${ta}_$tb""".stripMargin
      val tags = Map("l_quantity" -> "q", "l_extendedprice" -> "p",
        "l_discount" -> "d")
      val aggSql = (Seq("l_quantity", "l_extendedprice", "l_discount")
        .map(c => sums(c, tags(c))) ++
        pairs.map { case (a, b) => prod(a, b, tags(a), tags(b)) })
        .mkString(",\n")
      val rows = pairs.map { case (a, b) =>
        val (ta, tb) = (tags(a), tags(b))
        s"""SELECT '$a' AS col_x, '$b' AS col_y, nn AS n,
           |  round((n * sp_${ta}_$tb - s_$ta * s_$tb) /
           |    sqrt((n * ss_$ta - s_$ta * s_$ta) *
           |         (n * ss_$tb - s_$tb * s_$tb)), 6) AS corr,
           |  round((n * sp_${ta}_$tb - s_$ta * s_$tb) / (n * n), 6)
           |    AS covar_pop
           |FROM m""".stripMargin
      }
      pre + "\n" + aggSql + "\n  FROM complete)\n" +
        rows.mkString("\nUNION ALL\n")
    },

    "stats_regression" ->
      """WITH m AS (SELECT l_returnflag,
        |  count(*) AS nn, CAST(count(*) AS DOUBLE) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(38,8))) AS DOUBLE) AS sx,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(38,8))) AS DOUBLE) AS sy,
        |  CAST(sum(CAST(CAST(l_quantity AS DECIMAL(19,4)) *
        |    CAST(l_quantity AS DECIMAL(19,4)) AS DECIMAL(38,8)))
        |    AS DOUBLE) AS sxx,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(19,4)) *
        |    CAST(l_extendedprice AS DECIMAL(19,4)) AS DECIMAL(38,8)))
        |    AS DOUBLE) AS syy,
        |  CAST(sum(CAST(CAST(l_quantity AS DECIMAL(19,4)) *
        |    CAST(l_extendedprice AS DECIMAL(19,4)) AS DECIMAL(38,8)))
        |    AS DOUBLE) AS sxy
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |  GROUP BY 1)
        |SELECT l_returnflag, nn AS n,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
        |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
        |    AS intercept,
        |  round((n * sxy - sx * sy) * (n * sxy - sx * sy) /
        |    ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
        |FROM m""".stripMargin,

    "stats_hist_width" ->
      """WITH f AS (SELECT l_extendedprice AS v,
        |    CAST(greatest(0, least(23,
        |      floor((l_extendedprice - 0) / 5000.0))) AS INT) AS bucket
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL)
        |SELECT bucket, count(*) AS n_rows,
        |  round(min(v), 6) AS min_v, round(max(v), 6) AS max_v,
        |  CAST(bucket AS BIGINT) * 5000 + 0 AS bucket_lo
        |FROM f GROUP BY 1""".stripMargin,

    "stats_quantiles" ->
      """WITH c AS (SELECT l_extendedprice AS v, count(*) AS cnt
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
        |r AS (SELECT v, cnt, sum(cnt) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM c),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM c),
        |ps AS (SELECT unnest([25, 50, 75, 90, 99]) AS p)
        |SELECT p,
        |  min(CASE WHEN cum >= (n * p + 99) // 100 THEN v END) AS value,
        |  CAST(max((n * p + 99) // 100) AS BIGINT) AS rank
        |FROM r, t, ps GROUP BY p""".stripMargin,

    "sketch_countmin" ->
      s"""WITH cells AS (${cmsCells("events")})
         |SELECT CAST(i AS INT) AS row_i, CAST(bucket AS INT) AS bucket,
         |  count(*) AS cnt
         |FROM cells GROUP BY 1, 2""".stripMargin,

    "sketch_countmin_estimate" ->
      s"""WITH k AS (SELECT user_id, count(*) AS exact_n FROM events
         |  GROUP BY 1),
         |cells AS (${cmsCells("k")}),
         |s AS (SELECT c.i, c.bucket, CAST(sum(k.exact_n) AS BIGINT) AS cnt
         |  FROM cells c JOIN k ON k.user_id = c.user_id
         |  GROUP BY 1, 2),
         |e AS (SELECT c.user_id, min(s.cnt) AS est
         |  FROM cells c JOIN s ON s.i = c.i AND s.bucket = c.bucket
         |  GROUP BY 1)
         |SELECT k.user_id, k.exact_n, e.est, e.est >= k.exact_n AS ok
         |FROM k JOIN e ON e.user_id = k.user_id""".stripMargin,

    "events_twap" ->
      """WITH e AS (SELECT event_id, event_type,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS tsec,
        |    value FROM events),
        |d AS (SELECT *, CAST(floor(tsec / 86400) AS BIGINT) AS day FROM e),
        |w AS (SELECT event_type, day, tsec, value,
        |    coalesce(lead(tsec) OVER (PARTITION BY event_type, day
        |      ORDER BY tsec, event_id), (day + 1) * 86400) AS nxt
        |  FROM d)
        |SELECT event_type, day, count(*) AS n,
        |  CAST(sum(nxt - tsec) AS BIGINT) AS total_sec,
        |  round(CAST(sum(CAST(CAST(value AS DECIMAL(18,4)) *
        |      CAST(nxt - tsec AS DECIMAL(18,4)) AS DECIMAL(38,8)))
        |      AS DOUBLE) / CAST(sum(nxt - tsec) AS DOUBLE), 6) AS twap
        |FROM w GROUP BY 1, 2""".stripMargin,

    "events_interarrival_hist" ->
      """WITH e AS (SELECT event_id, event_type,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS tsec
        |  FROM events),
        |d AS (SELECT *, CAST(floor(tsec / 86400) AS BIGINT) AS day FROM e),
        |g AS (SELECT event_type,
        |    tsec - lag(tsec) OVER (PARTITION BY event_type, day
        |      ORDER BY tsec, event_id) AS gap
        |  FROM d)
        |SELECT event_type, CAST(least(floor(gap / 60), 59) AS INT) AS bucket,
        |  count(*) AS n, CAST(max(gap) AS BIGINT) AS max_gap_sec
        |FROM g WHERE gap IS NOT NULL GROUP BY 1, 2""".stripMargin,

    "quality_ref_integrity" ->
      """SELECT 'lineitem->orders' AS relationship, count(*) AS n_orphans
        |FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'lineitem->part', count(*) FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l.l_partkey)
        |UNION ALL
        |SELECT 'lineitem->supplier', count(*) FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = l.l_suppkey)
        |UNION ALL
        |SELECT 'orders->customer', count(*) FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o.o_custkey)
        |UNION ALL
        |SELECT 'customer->nation', count(*) FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM nation
        |                  WHERE n_nationkey = c.c_nationkey)""".stripMargin,

    "analytics_running_revenue" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS INT) AS order_seq,
        |  round(CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE), 6)
        |    AS price,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6)
        |    AS cum_rev
        |FROM orders""".stripMargin,

    "events_versioned_rollback" ->
      """SELECT event_type, count(*) AS n,
        |  round(sum(value), 6) AS sum_value
        |FROM events WHERE event_type IN ('view', 'click')
        |GROUP BY 1""".stripMargin,

    "graph_pagerank" -> pagerankSql(8),

    "stats_hist_depth" ->
      """WITH c AS (SELECT l_extendedprice AS v, count(*) AS cnt
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
        |r AS (SELECT v, cnt,
        |    coalesce(sum(cnt) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS rank_before
        |  FROM c),
        |t AS (SELECT sum(cnt) AS n FROM c)
        |SELECT CAST((rank_before * 10) // n AS INT) AS bucket,
        |  CAST(sum(cnt) AS BIGINT) AS n_rows, count(*) AS n_values,
        |  round(min(v), 6) AS min_v, round(max(v), 6) AS max_v
        |FROM r, t GROUP BY 1""".stripMargin
  )
}
