package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 57 (SURVEY §2.28):
  *
  *  - `maint_mv_incremental`: incremental materialized-view maintenance
  *    — a daily-count MV merged with a late delta batch must equal the
  *    full recompute, cell for cell; the additive-aggregate MV refresh
  *    every lakehouse runs.
  *  - `chp_retention_fit`: power-law fit of the retention curve
  *    (ln r_k = a + b·ln k) with a day-60 projection — the growth-team
  *    extrapolation beyond the observed window.
  *  - `chp_peak_concurrency`: peak concurrent sessions per day from the
  *    ±1 endpoint sweep — the capacity-planning number, exact integers.
  */
object QRound9bf extends QueryPack {

  // ---- maint_mv_incremental ----

  /** Incremental MV refresh: the (type, day) count MV built from days
    * < 25, a delta batch of days ≥ 25 aggregated the same way, merged
    * by full-outer key union with coalesced adds. The per-type report
    * compares the merged MV against the from-scratch recompute — equal
    * totals AND equal cell count is the refresh-correctness contract.
    *
    * Scale shape: base/delta/recompute are one aggregate each; the
    * merge joins on the (type, day) MV key — the incremental path
    * touches only delta keys at scale. */
  private[graft] def mvIncremental(events: DataFrame): DataFrame = {
    def dailyOf(df: DataFrame) = df
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast(DateType).as("dt"))
      .agg(count(lit(1)).as("cnt"))
    val base = dailyOf(events.filter(dayofmonth(col("ts")) < 25))
    val delta = dailyOf(events.filter(dayofmonth(col("ts")) >= 25))
      .select(col("event_type"), col("dt"), col("cnt").as("d_cnt"))
    val merged = base.join(delta, Seq("event_type", "dt"), "full_outer")
      .select(col("event_type"), col("dt"),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L)))
          .as("cnt"))
    val recomputed = dailyOf(events)
      .select(col("event_type"), col("dt"), col("cnt").as("r_cnt"))
    merged.join(recomputed, Seq("event_type", "dt"), "full_outer")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_cells"),
        sum(coalesce(col("cnt"), lit(0L))).as("total_merged"),
        sum(coalesce(col("r_cnt"), lit(0L))).as("total_recomputed"),
        sum((coalesce(col("cnt"), lit(-1L)) =!=
          coalesce(col("r_cnt"), lit(-2L))).cast(LongType))
          .as("n_mismatched"))
      .withColumn("refresh_ok",
        (col("n_mismatched") === 0).cast(IntegerType))
      .orderBy("event_type")
  }

  private def maintMvIncremental(s: SparkSession, d: String): DataFrame =
    mvIncremental(t(s, d, "events"))

  private val oMaintMvIncremental =
    s"""WITH base AS (SELECT event_type,
       |    CAST(date_trunc('day', ts) AS DATE) AS dt,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM events WHERE day(ts) < 25 GROUP BY 1, 2),
       |delta AS (SELECT event_type,
       |    CAST(date_trunc('day', ts) AS DATE) AS dt,
       |    CAST(count(*) AS BIGINT) AS d_cnt
       |  FROM events WHERE day(ts) >= 25 GROUP BY 1, 2),
       |merged AS (SELECT coalesce(b.event_type, d.event_type)
       |    AS event_type, coalesce(b.dt, d.dt) AS dt,
       |    coalesce(b.cnt, 0) + coalesce(d.d_cnt, 0) AS cnt
       |  FROM base b FULL OUTER JOIN delta d
       |    ON b.event_type = d.event_type AND b.dt = d.dt),
       |rec AS (SELECT event_type,
       |    CAST(date_trunc('day', ts) AS DATE) AS dt,
       |    CAST(count(*) AS BIGINT) AS r_cnt
       |  FROM events GROUP BY 1, 2),
       |j AS (SELECT coalesce(m.event_type, r.event_type) AS event_type,
       |    m.cnt, r.r_cnt
       |  FROM merged m FULL OUTER JOIN rec r
       |    ON m.event_type = r.event_type AND m.dt = r.dt)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_cells,
       |  CAST(sum(coalesce(cnt, 0)) AS BIGINT) AS total_merged,
       |  CAST(sum(coalesce(r_cnt, 0)) AS BIGINT) AS total_recomputed,
       |  CAST(sum(CASE WHEN coalesce(cnt, -1) <> coalesce(r_cnt, -2)
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched,
       |  CASE WHEN sum(CASE WHEN coalesce(cnt, -1) <> coalesce(r_cnt, -2)
       |    THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END AS refresh_ok
       |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- chp_retention_fit ----

  /** Retention power-law: r_k = share of users active exactly k days
    * after their own first day; OLS of ln r_k on ln k over k ≥ 1 with
    * r_k > 0 (scale-to-long term sums so the ≤29-point regression is
    * order-free), plus the day-60 projection exp(a + b·ln 60) — the
    * standard decay extrapolation. Counts are exact; only the fit runs
    * in doubles.
    *
    * Scale shape: one per-user first-day aggregate, one (user, offset)
    * distinct, one ≤30-row curve; the fit is a bounded rollup. */
  private[graft] def retentionFit(events: DataFrame): DataFrame = {
    val dd = DoubleType
    val days = events.select(col("user_id"),
      expr("unix_micros(cast(date_trunc('DAY', ts) as timestamp)) div 86400000000")
        .as("day"))
    val first = days.groupBy("user_id").agg(min("day").as("d0"))
    val nUsers = first.agg(count(lit(1)).as("n_users"))
    val curve = days.join(first, "user_id")
      .select(col("user_id"), (col("day") - col("d0")).as("k"))
      .distinct()
      .groupBy("k").agg(count(lit(1)).as("n_active"))
      .crossJoin(broadcast(nUsers))
      .withColumn("r", col("n_active").cast(dd) / col("n_users").cast(dd))
      .localCheckpoint(true)
    val fitPts = curve.filter(col("k") >= 1 && col("n_active") > 0)
      .select(log(col("k").cast(dd)).as("x"), log(col("r")).as("y"))
    val fit = fitPts.agg(count(lit(1)).as("n_pts"),
        sum(floor(col("x") * lit(1e12) + lit(0.5)).cast(LongType)).as("sx"),
        sum(floor(col("y") * lit(1e12) + lit(0.5)).cast(LongType)).as("sy"),
        sum(floor(col("x") * col("x") * lit(1e12) + lit(0.5))
          .cast(LongType)).as("sxx"),
        sum(floor(col("x") * col("y") * lit(1e12) + lit(0.5))
          .cast(LongType)).as("sxy"))
      .select(col("n_pts"),
        ((col("n_pts").cast(dd) * col("sxy").cast(dd) -
          col("sx").cast(dd) * col("sy").cast(dd)) /
         (col("n_pts").cast(dd) * col("sxx").cast(dd) -
          col("sx").cast(dd) * col("sx").cast(dd))).as("b"),
        col("sx"), col("sy"))
      .select(col("n_pts"), col("b"),
        ((col("sy").cast(dd) / lit(1e12) -
          col("b") * (col("sx").cast(dd) / lit(1e12))) /
          col("n_pts").cast(dd)).as("a"))
    val r30 = curve.filter(col("k") === 29)
      .agg(coalesce(max(trunc4(col("r"))), lit(-1.0)).as("r_day29"))
    fit.crossJoin(broadcast(r30))
      .select(col("n_pts"), trunc4(col("a")).as("intercept"),
        trunc4(col("b")).as("slope"), col("r_day29"),
        trunc4(exp(col("a") + col("b") *
          log(lit(60.0)))).as("r60_projected"))
  }

  private def chpRetentionFit(s: SparkSession, d: String): DataFrame =
    retentionFit(t(s, d, "events"))

  private val oChpRetentionFit =
    s"""WITH days AS (SELECT user_id,
       |    epoch_us(date_trunc('day', ts)) // 86400000000 AS day
       |  FROM events),
       |first AS (SELECT user_id, min(day) AS d0 FROM days GROUP BY 1),
       |nu AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM first),
       |curve AS MATERIALIZED (SELECT k, CAST(count(*) AS BIGINT)
       |    AS n_active,
       |    CAST(count(*) AS DOUBLE) / max(n.n_users) AS r
       |  FROM (SELECT DISTINCT d.user_id, d.day - f.d0 AS k
       |    FROM days d JOIN first f ON d.user_id = f.user_id), nu n
       |  GROUP BY k),
       |pts AS (SELECT ln(CAST(k AS DOUBLE)) AS x, ln(r) AS y
       |  FROM curve WHERE k >= 1 AND n_active > 0),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS n_pts,
       |    CAST(sum(CAST(floor(x * 1e12 + 5e-1) AS BIGINT)) AS BIGINT)
       |      AS sx,
       |    CAST(sum(CAST(floor(y * 1e12 + 5e-1) AS BIGINT)) AS BIGINT)
       |      AS sy,
       |    CAST(sum(CAST(floor(x * x * 1e12 + 5e-1) AS BIGINT)) AS BIGINT)
       |      AS sxx,
       |    CAST(sum(CAST(floor(x * y * 1e12 + 5e-1) AS BIGINT)) AS BIGINT)
       |      AS sxy FROM pts),
       |f1 AS (SELECT n_pts,
       |    (CAST(n_pts AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
       |    (CAST(n_pts AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS b,
       |    sx, sy FROM m),
       |f2 AS (SELECT n_pts, b,
       |    (CAST(sy AS DOUBLE) / 1e12 - b * (CAST(sx AS DOUBLE) / 1e12))
       |      / n_pts AS a FROM f1),
       |r30 AS (SELECT coalesce(max(${oTrunc4("r")}), -1e0) AS r_day29
       |  FROM curve WHERE k = 29)
       |SELECT n_pts, ${oTrunc4("a")} AS intercept,
       |  ${oTrunc4("b")} AS slope, r.r_day29,
       |  ${oTrunc4("exp(a + b * ln(6e1))")} AS r60_projected
       |FROM f2, r30 r""".stripMargin

  // ---- chp_peak_concurrency ----

  /** Peak concurrent sessions per day: each 30-min-gap session emits a
    * +1 at its start and a −1 at its end (+1s after −1s at equal
    * instants — the conservative sweep order); the running sum within
    * each day peaks at the capacity-planning number. All integers; ties
    * break on (us, delta, user, session).
    *
    * Scale shape: sessions from the user-partitioned islands pass; the
    * sweep window partitions by DAY (never global); per-day rollups. */
  private[graft] def peakConcurrency(events: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy("us", "event_id")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = events
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(cast(ts as timestamp))").as("us"))
      .withColumn("prev_us", lag("us", 1).over(wOrd))
      .withColumn("new_sess",
        (col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L)
          .cast(LongType))
      .withColumn("session_idx", sum("new_sess").over(wRun))
      .groupBy("user_id", "session_idx")
      .agg(min("us").as("s_us"), max("us").as("e_us"))
    val endpoints = sessions
      .select(col("user_id"), col("session_idx"),
        col("s_us").as("us"), lit(1L).as("delta"))
      .unionByName(sessions.select(col("user_id"), col("session_idx"),
        col("e_us").as("us"), lit(-1L).as("delta")))
      .withColumn("day", expr("us div 86400000000"))
    val wDay = Window.partitionBy("day")
      .orderBy(col("us"), col("delta"), col("user_id"), col("session_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    endpoints
      .withColumn("conc", sum("delta").over(wDay))
      .groupBy("day")
      .agg(sum(when(col("delta") === 1, 1L).otherwise(0L))
          .as("n_session_starts"),
        max("conc").as("peak_concurrent"))
      .orderBy("day")
  }

  private def chpPeakConcurrency(s: SparkSession, d: String): DataFrame =
    peakConcurrency(t(s, d, "events"))

  private val oChpPeakConcurrency =
    s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us
       |  FROM events),
       |l AS (SELECT *, lag(us) OVER (PARTITION BY user_id
       |    ORDER BY us, event_id) AS prev_us FROM e),
       |f AS (SELECT *, CASE WHEN prev_us IS NULL
       |    OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
       |  FROM l),
       |g AS (SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id
       |    ORDER BY us, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS BIGINT) AS session_idx FROM f),
       |sess AS (SELECT user_id, session_idx, min(us) AS s_us,
       |    max(us) AS e_us FROM g GROUP BY 1, 2),
       |ep AS (SELECT user_id, session_idx, s_us AS us,
       |    CAST(1 AS BIGINT) AS delta FROM sess
       |  UNION ALL SELECT user_id, session_idx, e_us,
       |    CAST(-1 AS BIGINT) FROM sess),
       |d2 AS (SELECT *, us // 86400000000 AS day FROM ep),
       |c AS (SELECT *, CAST(sum(delta) OVER (PARTITION BY day
       |    ORDER BY us, delta, user_id, session_idx
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS BIGINT) AS conc FROM d2)
       |SELECT day, CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_session_starts,
       |  CAST(max(conc) AS BIGINT) AS peak_concurrent
       |FROM c GROUP BY day ORDER BY day""".stripMargin

  val queries: Map[String, QFn] = Map(
    "maint_mv_incremental" -> maintMvIncremental _,
    "chp_retention_fit"    -> chpRetentionFit _,
    "chp_peak_concurrency" -> chpPeakConcurrency _)

  val oracles: Map[String, String] = Map(
    "maint_mv_incremental" -> oMaintMvIncremental,
    "chp_retention_fit"    -> oChpRetentionFit,
    "chp_peak_concurrency" -> oChpPeakConcurrency)
}
