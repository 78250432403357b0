package graft.queries

import graft.Tables
import graft.ops.{DataProfile, EventOps}
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
        "l_extendedprice", 0L, 120000L, 10))
  )

  val oracle: Map[String, String] = Map(

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
