package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 49 (SURVEY §2.28):
  *
  *  - `ts_burst_hysteresis`: two-threshold hysteresis burst detection
  *    over the hourly series — enter a burst above 2× the mean rate,
  *    leave below 1.2× — with episode segmentation; the sequential
  *    state resolves as a conditional carry-forward window, no
  *    iteration.
  *  - `chp_ratio_metric_ci`: delta-method confidence interval for a
  *    ratio-of-sums metric (spend per event) — the correct CI every
  *    experimentation platform uses where per-user averaging is wrong.
  *  - `maint_backfill_plan`: reprocessing plan for under-filled daily
  *    partitions — below-90%-of-mean days grouped into contiguous runs
  *    and capped into ≤7-day chunks.
  */
object QRound9ax extends QueryPack {

  // ---- ts_burst_hysteresis ----

  /** Hysteresis burst detector per event type: with per-type hourly
    * counts c and total s1 over n hours, an hour flags 1 when c·n > 2·s1
    * (above twice the mean), 0 when 5·c·n < 6·s1 (below 1.2× the mean),
    * else carries the previous state (`last ignoreNulls` — the
    * conditional carry-forward). Thresholds are pure BIGINT
    * cross-products, so the state sequence is exact; episodes are
    * islands of state 1.
    *
    * Scale shape: all windows partition by event_type; the episode
    * rollup is bounded by the series length. */
  private[graft] def burstHysteresis(events: DataFrame): DataFrame = {
    val dd = DoubleType
    val wT = Window.partitionBy("event_type")
    val wOrd = wT.orderBy("hr")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("c"))
      .withColumn("n", count(lit(1)).over(wT))
      .withColumn("s1", sum("c").over(wT))
    val state = hourly
      .withColumn("flag",
        when(col("c") * col("n") > col("s1") * 2, lit(1))
          .when(col("c") * col("n") * 5 < col("s1") * 6, lit(0)))
      .withColumn("st", coalesce(
        last("flag", ignoreNulls = true).over(wRun), lit(0)))
      .withColumn("rise",
        (col("st") === 1 &&
          coalesce(lag("st", 1).over(wOrd), lit(0)) === 0)
          .cast(LongType))
      .withColumn("episode", sum("rise").over(wRun))
    val epLens = state.filter(col("st") === 1)
      .groupBy("event_type", "episode").agg(count(lit(1)).as("len"))
      .groupBy("event_type").agg(max("len").as("max_episode_len"))
    state.groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"),
        sum("st").cast(LongType).as("n_burst_hours"),
        sum("rise").as("n_episodes"))
      .join(epLens, Seq("event_type"), "left")
      .select(col("event_type"), col("n_hours"), col("n_burst_hours"),
        col("n_episodes"),
        coalesce(col("max_episode_len"), lit(0L)).as("max_episode_len"),
        trunc4(col("n_burst_hours").cast(dd) / col("n_hours").cast(dd))
          .as("burst_share"))
      .orderBy("event_type")
  }

  private def tsBurstHysteresis(s: SparkSession, d: String): DataFrame =
    burstHysteresis(t(s, d, "events"))

  private val oTsBurstHysteresis =
    s"""WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS hr,
       |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
       |tot AS (SELECT *, CAST(count(*) OVER w AS BIGINT) AS n,
       |    CAST(sum(c) OVER w AS BIGINT) AS s1
       |  FROM hourly WINDOW w AS (PARTITION BY event_type)),
       |fl AS (SELECT *, CASE WHEN c * n > s1 * 2 THEN 1
       |    WHEN c * n * 5 < s1 * 6 THEN 0 END AS flag FROM tot),
       |st AS (SELECT *, coalesce(last_value(flag IGNORE NULLS) OVER (
       |    PARTITION BY event_type ORDER BY hr
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS st
       |  FROM fl),
       |ep AS (SELECT *, CASE WHEN st = 1 AND coalesce(lag(st) OVER (
       |      PARTITION BY event_type ORDER BY hr), 0) = 0
       |    THEN 1 ELSE 0 END AS rise FROM st),
       |ep2 AS (SELECT *, CAST(sum(rise) OVER (PARTITION BY event_type
       |    ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS BIGINT) AS episode FROM ep),
       |lens AS (SELECT event_type, CAST(max(len) AS BIGINT)
       |    AS max_episode_len FROM (
       |  SELECT event_type, episode, count(*) AS len FROM ep2
       |  WHERE st = 1 GROUP BY 1, 2) GROUP BY 1),
       |agg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
       |    CAST(sum(st) AS BIGINT) AS n_burst_hours,
       |    CAST(sum(rise) AS BIGINT) AS n_episodes
       |  FROM ep2 GROUP BY 1)
       |SELECT a.event_type, a.n_hours, a.n_burst_hours, a.n_episodes,
       |  coalesce(l.max_episode_len, 0) AS max_episode_len,
       |  ${oTrunc4("CAST(a.n_burst_hours AS DOUBLE) / a.n_hours")}
       |    AS burst_share
       |FROM agg a LEFT JOIN lens l ON a.event_type = l.event_type
       |ORDER BY a.event_type""".stripMargin

  // ---- chp_ratio_metric_ci ----

  /** Delta-method CI for the ratio-of-sums metric R = Σy/Σx (purchase
    * spend per event): Var(R) ≈ (σ²_y − 2R·σ_xy + R²·σ²_x)/(n·μ²_x) over
    * per-user (x, y); CI95 = R ± 1.96·SE. Naive per-user averaging is
    * biased for ratio metrics — this is the standard correction (Deng
    * et al.). Second moments accumulate as exact DECIMAL products; the
    * covariance algebra runs on identical doubles; trunc4 once per
    * output.
    *
    * Scale shape: one per-user aggregate, one 6-sum rollup. */
  private[graft] def ratioMetricCi(events: DataFrame): DataFrame = {
    val dd = DoubleType
    val d4 = DecimalType(18, 4)
    val user = events.groupBy("user_id")
      .agg(count(lit(1)).cast(d4).as("x"),
        sum(when(col("event_type") === "purchase",
          col("value").cast(d4)).otherwise(lit(0).cast(d4)))
          .cast(d4).as("y"))
    val m = user.agg(count(lit(1)).as("n"),
        sum(col("x")).cast(dd).as("sx"), sum(col("y")).cast(dd).as("sy"),
        sum(col("x") * col("x")).cast(dd).as("sxx"),
        sum(col("y") * col("y")).cast(dd).as("syy"),
        sum(col("x") * col("y")).cast(dd).as("sxy"))
    m.select(col("n"), col("sx"), col("sy"),
        (col("sy") / col("sx")).as("r"),
        (col("sx") / col("n").cast(dd)).as("mx"),
        ((col("syy") - col("sy") * col("sy") / col("n").cast(dd))
          / col("n").cast(dd)).as("vy"),
        ((col("sxx") - col("sx") * col("sx") / col("n").cast(dd))
          / col("n").cast(dd)).as("vx"),
        ((col("sxy") - col("sx") * col("sy") / col("n").cast(dd))
          / col("n").cast(dd)).as("cxy"))
      .select(col("n"), col("r"), col("mx"), col("vy"), col("vx"),
        col("cxy"),
        sqrt((col("vy") - lit(2.0) * col("r") * col("cxy") +
          col("r") * col("r") * col("vx")) /
          (col("n").cast(dd) * col("mx") * col("mx"))).as("se"))
      .select(col("n"),
        trunc4(col("r")).as("ratio"),
        trunc4(col("se")).as("se"),
        trunc4(col("r") - lit(1.96) * col("se")).as("ci_lo"),
        trunc4(col("r") + lit(1.96) * col("se")).as("ci_hi"))
  }

  private def chpRatioMetricCi(s: SparkSession, d: String): DataFrame =
    ratioMetricCi(t(s, d, "events"))

  private val oChpRatioMetricCi =
    s"""WITH u AS (SELECT user_id,
       |    CAST(count(*) AS DECIMAL(18,4)) AS x,
       |    CAST(sum(CASE WHEN event_type = 'purchase'
       |      THEN CAST(value AS DECIMAL(18,4))
       |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS y
       |  FROM events GROUP BY user_id),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
       |    CAST(sum(x * x) AS DOUBLE) AS sxx,
       |    CAST(sum(y * y) AS DOUBLE) AS syy,
       |    CAST(sum(x * y) AS DOUBLE) AS sxy FROM u),
       |r1 AS (SELECT n, sy / sx AS r, sx / n AS mx,
       |    (syy - sy * sy / n) / n AS vy,
       |    (sxx - sx * sx / n) / n AS vx,
       |    (sxy - sx * sy / n) / n AS cxy FROM m),
       |r2 AS (SELECT n, r,
       |    sqrt((vy - 2e0 * r * cxy + r * r * vx) / (n * mx * mx)) AS se
       |  FROM r1)
       |SELECT n, ${oTrunc4("r")} AS ratio, ${oTrunc4("se")} AS se,
       |  ${oTrunc4("r - 196e-2 * se")} AS ci_lo,
       |  ${oTrunc4("r + 196e-2 * se")} AS ci_hi
       |FROM r2""".stripMargin

  // ---- maint_backfill_plan ----

  /** Backfill planner: per event type, a day is under-filled when its
    * event count is below 90% of the type's mean daily count
    * (10·c·n < 9·s1, pure BIGINT). Under-filled days group into contiguous runs (the
    * date-minus-row-number island key) and runs split into ≤7-day
    * chunks — the reprocessing units an orchestrator would submit.
    * Dates are emitted as ISO strings (no DATE in output schemas).
    *
    * Scale shape: one daily rollup; islands partition by type; output
    * is bounded by the plan size. */
  private[graft] def backfillPlan(events: DataFrame): DataFrame = {
    val wT = Window.partitionBy("event_type")
    val wOrd = wT.orderBy("d")
    val daily = events
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast(DateType).as("dt"))
      .agg(count(lit(1)).as("c"))
      .withColumn("d", datediff(col("dt"), lit("1970-01-01").cast(DateType))
        .cast(LongType))
      .withColumn("n", count(lit(1)).over(wT))
      .withColumn("s1", sum("c").over(wT))
    val under = daily.filter(col("c") * col("n") * 10 < col("s1") * 9)
      .withColumn("rn", row_number().over(wOrd).cast(LongType))
      .withColumn("isl", col("d") - col("rn"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("event_type", "isl").orderBy("d"))
        .cast(LongType))
      .withColumn("chunk", expr("(pos - 1) div 7"))
    under.groupBy("event_type", "isl", "chunk")
      .agg(min("dt").as("start_dt"), max("dt").as("end_dt"),
        count(lit(1)).as("n_days"), sum("c").as("n_events"))
      .select(col("event_type"),
        col("start_dt").cast(StringType).as("start_date"),
        col("end_dt").cast(StringType).as("end_date"),
        col("n_days"), col("n_events"))
      .orderBy("event_type", "start_date")
  }

  private def maintBackfillPlan(s: SparkSession, d: String): DataFrame =
    backfillPlan(t(s, d, "events"))

  private val oMaintBackfillPlan =
    s"""WITH daily AS (SELECT event_type,
       |    CAST(date_trunc('day', ts) AS DATE) AS dt,
       |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
       |tot AS (SELECT *,
       |    CAST(date_diff('day', DATE '1970-01-01', dt) AS BIGINT) AS d,
       |    CAST(count(*) OVER w AS BIGINT) AS n,
       |    CAST(sum(c) OVER w AS BIGINT) AS s1
       |  FROM daily WINDOW w AS (PARTITION BY event_type)),
       |und AS (SELECT *, CAST(row_number() OVER (
       |      PARTITION BY event_type ORDER BY d) AS BIGINT) AS rn
       |  FROM tot WHERE c * n * 10 < s1 * 9),
       |isl AS (SELECT *, d - rn AS isl, CAST(row_number() OVER (
       |      PARTITION BY event_type, d - rn ORDER BY d) AS BIGINT) AS pos
       |  FROM und),
       |ch AS (SELECT *, (pos - 1) // 7 AS chunk FROM isl)
       |SELECT event_type, CAST(min(dt) AS VARCHAR) AS start_date,
       |  CAST(max(dt) AS VARCHAR) AS end_date,
       |  CAST(count(*) AS BIGINT) AS n_days,
       |  CAST(sum(c) AS BIGINT) AS n_events
       |FROM ch GROUP BY event_type, isl, chunk
       |ORDER BY event_type, start_date""".stripMargin

  val queries: Map[String, QFn] = Map(
    "ts_burst_hysteresis" -> tsBurstHysteresis _,
    "chp_ratio_metric_ci" -> chpRatioMetricCi _,
    "maint_backfill_plan" -> maintBackfillPlan _)

  val oracles: Map[String, String] = Map(
    "ts_burst_hysteresis" -> oTsBurstHysteresis,
    "chp_ratio_metric_ci" -> oChpRatioMetricCi,
    "maint_backfill_plan" -> oMaintBackfillPlan)
}
