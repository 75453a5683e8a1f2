package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 29 (SURVEY §2.28):
  *
  *  - `chp_rfm_segments`: RFM (recency/frequency/monetary) quintile
  *    segmentation — the marketing-analytics classic, with breakpoints
  *    computed by the broadcast-breakpoint discipline (never a global
  *    ntile).
  *  - `chp_reason_codes`: per-user top reason code from the frozen
  *    linear churn model (largest |w·(x − mean)| contribution) — the
  *    "why is this user scored high" explanation serving needs.
  *  - `profile_freshness_lag`: per-type ingestion freshness audit (lag
  *    behind the newest event + staleness flag) — the first dashboard a
  *    pipeline operator checks.
  */
object QRound9ad extends QueryPack {

  // ---- chp_rfm_segments ----

  /** RFM quintile segmentation over the churn feature table: R = days
    * inactive (lower is better), F = clicks+purchases, M = exact cents.
    * Breakpoints are the four "smallest v with 5·cum ≥ k·n" cuts over
    * each metric's DISTINCT-value cumulative (the weighted-median
    * spelling — value-domain bounded, never a global ntile, which the
    * PlanSpec scale gate bans); score = 1 + #(breakpoints strictly
    * below), recency reversed (6 − score). Output is the segment
    * rollup: users, exact cents, trunc4 mean recency per (r,f,m) cell.
    *
    * Scale shape: one feature pass; three distinct-value aggregates
    * with per-metric windows; 4-row breakpoint tables broadcast back;
    * final rollup is ≤125 cells. */
  private[graft] def rfmSegments(features: DataFrame): DataFrame = {
    val dd = DoubleType
    // user-bounded table referenced ~15x across the breakpoint/score
    // branches — checkpoint once so the events scan runs once, not per
    // branch (first spelling re-derived the feature pass each time:
    // 3.8 s warm; checkpointed it's one scan + tiny jobs)
    val f = features.select(col("user_id"),
      col("days_inactive").as("r"),
      (col("n_clicks") + col("n_purchases")).as("f"),
      floor(col("total_value") * lit(1e2) + lit(5e-1)).cast(LongType).as("m"))
      .localCheckpoint()

    def breakpoints(metric: String): DataFrame = {
      val pv = f.groupBy(col(metric).as("v")).agg(count(lit(1)).as("c"))
      val n = pv.agg(sum(col("c")).as("n"))
      // cumulative over the distinct-value table via the shared
      // two-level prefix sum (QRound9w) — never a global window
      QRound9w.twoLevelCum(pv, 64, Seq("c"))
        .crossJoin(broadcast(n))
        .select(col("v"), col("cum_c").as("cum"), col("n"))
    }

    // 4 cut values per metric — ONE aggregate (min v over qualifying
    // rows), not 4 limit(1) subplans: the first spelling built 12
    // separate limit branches and paid the local job floor on each
    // (4 s warm); one aggregate per metric + a single scoring pass is
    // 5 small jobs total.
    def cutsOf(bp: DataFrame, pfx: String): DataFrame = {
      val aggs = (1 to 4).map { k =>
        min(when(lit(5L) * col("cum") >= lit(k.toLong) * col("n"),
          col("v"))).as(s"$pfx$k")
      }
      bp.agg(aggs.head, aggs.tail: _*)
    }
    val allCuts = cutsOf(breakpoints("f"), "fb")
      .crossJoin(cutsOf(breakpoints("m"), "mb"))
      .crossJoin(cutsOf(breakpoints("r"), "rb"))
    def score(metric: String, pfx: String) =
      lit(1L) + (1 to 4).map(k =>
        (col(metric) > col(s"$pfx$k")).cast(LongType)).reduce(_ + _)
    f.crossJoin(broadcast(allCuts))
      .select(col("user_id"), col("r"), col("m"),
        (lit(6L) - score("r", "rb")).as("r_score"),
        score("f", "fb").as("f_score"),
        score("m", "mb").as("m_score"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_users"), sum(col("m")).as("cents_total"),
        trunc4(sum(col("r")).cast(dd) / count(lit(1)).cast(dd))
          .as("mean_recency"))
      .orderBy("r_score", "f_score", "m_score")
  }

  private def chpRfmSegments(s: SparkSession, d: String): DataFrame =
    rfmSegments(QPipeline.chpFeaturesLabel(s, d))

  private val oChpRfmSegments = {
    def bp(metric: String) =
      s"""pv_$metric AS (SELECT $metric AS v, CAST(count(*) AS BIGINT) AS c
         |  FROM f0 GROUP BY 1),
         |cum_$metric AS (SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT)
         |    AS cum, (SELECT CAST(sum(c) AS BIGINT) FROM pv_$metric) AS n
         |  FROM pv_$metric),
         |bp_$metric AS (SELECT
         |  (SELECT min(v) FROM cum_$metric WHERE 5 * cum >= 1 * n) AS bp1,
         |  (SELECT min(v) FROM cum_$metric WHERE 5 * cum >= 2 * n) AS bp2,
         |  (SELECT min(v) FROM cum_$metric WHERE 5 * cum >= 3 * n) AS bp3,
         |  (SELECT min(v) FROM cum_$metric WHERE 5 * cum >= 4 * n) AS bp4)"""
        .stripMargin
    def sc(metric: String) =
      s"""(1 + CAST($metric > bp_$metric.bp1 AS BIGINT)
         |   + CAST($metric > bp_$metric.bp2 AS BIGINT)
         |   + CAST($metric > bp_$metric.bp3 AS BIGINT)
         |   + CAST($metric > bp_$metric.bp4 AS BIGINT))""".stripMargin
    s"""WITH feat AS (${QPipeline.oChpFeaturesLabel}),
       |f0 AS (SELECT user_id, days_inactive AS r,
       |    n_clicks + n_purchases AS f,
       |    CAST(floor(total_value * 1e2 + 5e-1) AS BIGINT) AS m FROM feat),
       |${bp("r")},
       |${bp("f")},
       |${bp("m")},
       |scored AS (SELECT f0.user_id, f0.r, f0.m,
       |    6 - ${sc("r")} AS r_score,
       |    ${sc("f")} AS f_score,
       |    ${sc("m")} AS m_score
       |  FROM f0, bp_r, bp_f, bp_m)
       |SELECT r_score, f_score, m_score,
       |  CAST(count(*) AS BIGINT) AS n_users,
       |  CAST(sum(m) AS BIGINT) AS cents_total,
       |  ${oTrunc4("CAST(sum(r) AS DOUBLE) / count(*)")} AS mean_recency
       |FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  }

  // ---- chp_reason_codes ----

  /** Per-user top reason code from the frozen linear model: the feature
    * with the largest |w_i·(N·x_i − S_i)| population-mean deviation
    * (N-scaling keeps the deviation integral before the single double
    * multiply by w_i; magnitude scale-to-long'd at 1e6 per N users,
    * feature-name tiebreak). direction = +1 pushes the score up.
    *
    * Scale shape: feature means are a 1-row broadcast; the per-user
    * 4-way argmax is a map-side greatest() chain — no explode, no
    * shuffle beyond the feature table's own. */
  private[graft] def reasonCodes(features: DataFrame): DataFrame = {
    val dd = DoubleType
    val means = features.agg(count(lit(1)).as("nn"),
      sum(col("n_clicks")).as("s_c"), sum(col("n_purchases")).as("s_p"),
      floor(sum(col("total_value")) * lit(1e2) + lit(5e-1)).cast(LongType)
        .as("s_v"),
      sum(col("days_inactive")).as("s_d"))
    // weights carried as the EXACT literal each engine binds (never a
    // Scala-side double product — 2e-4*1e-2 need not be bit-equal 2e-6)
    val ws = Seq(("n_clicks", 2e-2, "s_c"),
      ("n_purchases", 1e-1, "s_p"),
      ("total_value", 2e-6, "s_v"), // 2e-4 per dollar = 2e-6 per cent
      ("days_inactive", -2e-1, "s_d"))
    val withDev = ws.foldLeft(features.crossJoin(broadcast(means))) {
      case (df, (feat, w, sCol)) =>
        val x =
          if (feat == "total_value")
            floor(col(feat) * lit(1e2) + lit(5e-1)).cast(LongType)
          else col(feat).cast(LongType)
        val dev = (x * col("nn") - col(sCol)).cast(dd) * lit(w)
        df.withColumn(s"mag_$feat",
            floor(abs(dev) * lit(1e6) / col("nn").cast(dd) + lit(0.5))
              .cast(LongType))
          .withColumn(s"sgn_$feat",
            when(dev >= 0, lit(1L)).otherwise(lit(-1L)))
    }
    val best = ws.map { case (feat, _, _) =>
      struct(col(s"mag_$feat").as("mag"),
        // tiebreak: LOWER name wins -> store name, take max(struct) with
        // negated... simpler: order by (mag, reverse-name) via max
        lit(feat).as("nm"), col(s"sgn_$feat").as("sgn"))
    }
    // argmax by magnitude with SMALLEST name on ties: max(struct(mag,
    // name)) picks the LARGEST name on mag ties, so invert via a sort
    // key = concat of fixed-width inverted name? Use array_sort instead:
    val arr = array(best: _*)
    val sorted = array_sort(arr, (l, r) =>
      when(l.getField("mag") > r.getField("mag"), -1)
        .when(l.getField("mag") < r.getField("mag"), 1)
        .when(l.getField("nm") < r.getField("nm"), -1)
        .when(l.getField("nm") > r.getField("nm"), 1)
        .otherwise(0))
    withDev
      .withColumn("top", element_at(sorted, 1))
      .select(col("user_id"), col("top.nm").as("reason"),
        col("top.sgn").as("direction"), col("top.mag").as("magnitude6"))
      .orderBy("user_id")
  }

  private def chpReasonCodes(s: SparkSession, d: String): DataFrame =
    reasonCodes(QPipeline.chpFeaturesLabel(s, d))

  private val oChpReasonCodes =
    s"""WITH feat AS (${QPipeline.oChpFeaturesLabel}),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS nn,
       |    CAST(sum(n_clicks) AS BIGINT) AS s_c,
       |    CAST(sum(n_purchases) AS BIGINT) AS s_p,
       |    CAST(floor(sum(total_value) * 1e2 + 5e-1) AS BIGINT) AS s_v,
       |    CAST(sum(days_inactive) AS BIGINT) AS s_d FROM feat),
       |dv AS (SELECT user_id, nm, sgn, mag FROM feat, m, LATERAL (VALUES
       |  ('n_clicks',
       |    CASE WHEN (n_clicks * nn - s_c) * 2e-2 >= 0 THEN 1 ELSE -1 END,
       |    CAST(floor(abs((n_clicks * nn - s_c) * 2e-2) * 1e6
       |      / CAST(nn AS DOUBLE) + 5e-1) AS BIGINT)),
       |  ('n_purchases',
       |    CASE WHEN (n_purchases * nn - s_p) * 1e-1 >= 0 THEN 1 ELSE -1 END,
       |    CAST(floor(abs((n_purchases * nn - s_p) * 1e-1) * 1e6
       |      / CAST(nn AS DOUBLE) + 5e-1) AS BIGINT)),
       |  ('total_value',
       |    CASE WHEN (CAST(floor(total_value * 1e2 + 5e-1) AS BIGINT) * nn
       |      - s_v) * 2e-6 >= 0 THEN 1 ELSE -1 END,
       |    CAST(floor(abs((CAST(floor(total_value * 1e2 + 5e-1) AS BIGINT)
       |      * nn - s_v) * 2e-6) * 1e6 / CAST(nn AS DOUBLE) + 5e-1)
       |      AS BIGINT)),
       |  ('days_inactive',
       |    CASE WHEN (days_inactive * nn - s_d) * -2e-1 >= 0 THEN 1
       |      ELSE -1 END,
       |    CAST(floor(abs((days_inactive * nn - s_d) * -2e-1) * 1e6
       |      / CAST(nn AS DOUBLE) + 5e-1) AS BIGINT))
       |  ) AS t(nm, sgn, mag)),
       |rk AS (SELECT user_id, nm, CAST(sgn AS BIGINT) AS sgn, mag,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY mag DESC, nm) AS rn FROM dv)
       |SELECT user_id, nm AS reason, sgn AS direction, mag AS magnitude6
       |FROM rk WHERE rn = 1 ORDER BY user_id""".stripMargin

  // ---- profile_freshness_lag ----

  /** Ingestion freshness per event type: newest event, exact hour lag
    * behind the globally newest event, staleness flag (> 24 h) — the
    * first pipeline-operator dashboard.
    *
    * Scale shape: one pass → per-type max aggregate; the global max is
    * a 1-row broadcast. */
  private[graft] def freshnessLag(events: DataFrame): DataFrame = {
    val perType = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        max(expr("unix_micros(cast(ts as timestamp))")).as("last_us"))
    val gmax = perType.agg(max(col("last_us")).as("g_us"))
    perType.crossJoin(broadcast(gmax))
      .select(col("event_type"), col("n"),
        expr("timestamp_micros(last_us)").cast(TimestampNTZType)
          .as("last_event"),
        expr("(g_us - last_us) div 3600000000").as("lag_hours"),
        when(expr("(g_us - last_us) div 3600000000") > 24, 1L).otherwise(0L)
          .as("stale"))
      .orderBy("event_type")
  }

  private def profileFreshnessLag(s: SparkSession, d: String): DataFrame =
    freshnessLag(t(s, d, "events"))

  private val oProfileFreshnessLag =
    """WITH pt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    max(epoch_us(ts)) AS last_us FROM events GROUP BY 1),
      |g AS (SELECT max(last_us) AS g_us FROM pt)
      |SELECT event_type, n, make_timestamp(last_us) AS last_event,
      |  (g_us - last_us) // 3600000000 AS lag_hours,
      |  CAST(CASE WHEN (g_us - last_us) // 3600000000 > 24 THEN 1 ELSE 0 END
      |    AS BIGINT) AS stale
      |FROM pt, g ORDER BY event_type""".stripMargin

  val queries: Map[String, QFn] = Map(
    "chp_rfm_segments"      -> chpRfmSegments _,
    "chp_reason_codes"      -> chpReasonCodes _,
    "profile_freshness_lag" -> profileFreshnessLag _)

  val oracles: Map[String, String] = Map(
    "chp_rfm_segments"      -> oChpRfmSegments,
    "chp_reason_codes"      -> oChpReasonCodes,
    "profile_freshness_lag" -> oProfileFreshnessLag)
}
