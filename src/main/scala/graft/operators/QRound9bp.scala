package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 67 (SURVEY §2.28):
  *
  *  - `ts_pacf_durbin`: partial autocorrelation (lags 1–5) via the
  *    Durbin–Levinson recursion — the ARIMA order-selection companion
  *    to the existing ACF keys.
  *  - `serve_rate_limit_audit`: sliding-window rate-limit audit — which
  *    users exceed K requests in any rolling 7-day window, and when the
  *    first breach happened.
  *  - `agg_cramers_v`: Cramér's V (raw + Bergsma bias-corrected)
  *    association between event type and day-of-week — the normalized
  *    effect size on top of the chi-square machinery.
  */
object QRound9bp extends QueryPack {

  private val dd = DoubleType

  // ---- ts_pacf_durbin ----

  // Durbin–Levinson tower, shared verbatim between Spark expr() and the
  // DuckDB oracle so every double op is spelled identically.
  private val f22 = "(r2 - p11*r1) / nullif(1e0 - p11*r1, 0e0)"
  private val f21 = "p11 - p22*p11"
  private val f33 =
    "(r3 - (p21*r2 + p22*r1)) / nullif(1e0 - (p21*r1 + p22*r2), 0e0)"
  private val f31 = "p21 - p33*p22"
  private val f32 = "p22 - p33*p21"
  private val f44 = "(r4 - (p31*r3 + p32*r2 + p33*r1)) / " +
    "nullif(1e0 - (p31*r1 + p32*r2 + p33*r3), 0e0)"
  private val f41 = "p31 - p44*p33"
  private val f42 = "p32 - p44*p32"
  private val f43 = "p33 - p44*p31"
  private val f55 = "(r5 - (p41*r4 + p42*r3 + p43*r2 + p44*r1)) / " +
    "nullif(1e0 - (p41*r1 + p42*r2 + p43*r3 + p44*r4), 0e0)"

  /** PACF(1..5) per event-type daily series: ACF with EXACT integer
    * moments (mean-centering via n·x − Σx keeps every product a
    * BIGINT; one double division per lag), then the Durbin–Levinson
    * recursion unrolled as a shared formula tower. pacf_k isolates the
    * direct lag-k effect with lags 1..k−1 regressed out — the
    * AR-order-selection diagnostic.
    *
    * Scale shape: per-type windows for the 5 leads, one rollup; the
    * recursion runs on a 5-row table of scalars. */
  private[graft] def pacfDurbin(s: SparkSession, d: String): DataFrame = {
    val daily = QRound9b.evDaily(s, d)
    val st = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum("cnt").as("stot"))
    val c = daily.join(broadcast(st), "event_type")
      .select(col("event_type"), col("day_num"), col("n_days"),
        (col("n_days") * col("cnt") - col("stot")).as("c"))
    val w = Window.partitionBy("event_type").orderBy("day_num")
    val led = c.select(col("event_type"), col("n_days"), col("c"),
      lead("c", 1).over(w).as("c1"), lead("c", 2).over(w).as("c2"),
      lead("c", 3).over(w).as("c3"), lead("c", 4).over(w).as("c4"),
      lead("c", 5).over(w).as("c5"))
    val m = led.groupBy("event_type", "n_days").agg(
      sum(col("c") * col("c")).as("den"),
      sum(col("c") * col("c1")).as("num1"),
      sum(col("c") * col("c2")).as("num2"),
      sum(col("c") * col("c3")).as("num3"),
      sum(col("c") * col("c4")).as("num4"),
      sum(col("c") * col("c5")).as("num5"))
    val rr = (1 to 5).foldLeft(m) { (df, k) =>
      df.withColumn(s"r$k",
        col(s"num$k").cast(dd) / nullif(col("den").cast(dd), lit(0.0)))
    }
    rr.withColumn("p11", expr("r1"))
      .withColumn("p22", expr(f22)).withColumn("p21", expr(f21))
      .withColumn("p33", expr(f33))
      .withColumn("p31", expr(f31)).withColumn("p32", expr(f32))
      .withColumn("p44", expr(f44))
      .withColumn("p41", expr(f41)).withColumn("p42", expr(f42))
      .withColumn("p43", expr(f43))
      .withColumn("p55", expr(f55))
      .select(col("event_type"), col("n_days"),
        trunc6(col("p11")).as("pacf1"), trunc6(col("p22")).as("pacf2"),
        trunc6(col("p33")).as("pacf3"), trunc6(col("p44")).as("pacf4"),
        trunc6(col("p55")).as("pacf5"))
      .orderBy("event_type")
  }

  private val oTsPacfDurbin =
    s"""WITH daily AS (SELECT event_type,
       |    epoch_us(date_trunc('day', ts)) // 86400000000 AS day_num,
       |    count(*) AS cnt FROM events GROUP BY 1, 2),
       |st AS (SELECT event_type, count(*) AS n_days,
       |    CAST(sum(cnt) AS BIGINT) AS stot FROM daily GROUP BY 1),
       |c AS (SELECT d.event_type, day_num, n_days,
       |    (n_days*cnt - stot) AS c FROM daily d JOIN st USING (event_type)),
       |led AS (SELECT event_type, n_days, c,
       |    lead(c, 1) OVER w AS c1, lead(c, 2) OVER w AS c2,
       |    lead(c, 3) OVER w AS c3, lead(c, 4) OVER w AS c4,
       |    lead(c, 5) OVER w AS c5
       |  FROM c WINDOW w AS (PARTITION BY event_type ORDER BY day_num)),
       |m AS (SELECT event_type, n_days,
       |    CAST(sum(c*c) AS BIGINT) AS den,
       |    CAST(sum(c*c1) AS BIGINT) AS num1,
       |    CAST(sum(c*c2) AS BIGINT) AS num2,
       |    CAST(sum(c*c3) AS BIGINT) AS num3,
       |    CAST(sum(c*c4) AS BIGINT) AS num4,
       |    CAST(sum(c*c5) AS BIGINT) AS num5
       |  FROM led GROUP BY 1, 2),
       |rr AS (SELECT event_type, n_days,
       |    CAST(num1 AS DOUBLE)/nullif(CAST(den AS DOUBLE), 0e0) AS r1,
       |    CAST(num2 AS DOUBLE)/nullif(CAST(den AS DOUBLE), 0e0) AS r2,
       |    CAST(num3 AS DOUBLE)/nullif(CAST(den AS DOUBLE), 0e0) AS r3,
       |    CAST(num4 AS DOUBLE)/nullif(CAST(den AS DOUBLE), 0e0) AS r4,
       |    CAST(num5 AS DOUBLE)/nullif(CAST(den AS DOUBLE), 0e0) AS r5
       |  FROM m),
       |l1 AS (SELECT *, (r1) AS p11 FROM rr),
       |l2 AS (SELECT *, ($f22) AS p22 FROM l1),
       |l2b AS (SELECT *, ($f21) AS p21 FROM l2),
       |l3 AS (SELECT *, ($f33) AS p33 FROM l2b),
       |l3b AS (SELECT *, ($f31) AS p31, ($f32) AS p32 FROM l3),
       |l4 AS (SELECT *, ($f44) AS p44 FROM l3b),
       |l4b AS (SELECT *, ($f41) AS p41, ($f42) AS p42, ($f43) AS p43 FROM l4),
       |l5 AS (SELECT *, ($f55) AS p55 FROM l4b)
       |SELECT event_type, n_days,
       |  ${oTrunc6("p11")} AS pacf1, ${oTrunc6("p22")} AS pacf2,
       |  ${oTrunc6("p33")} AS pacf3, ${oTrunc6("p44")} AS pacf4,
       |  ${oTrunc6("p55")} AS pacf5
       |FROM l5 ORDER BY event_type""".stripMargin

  // ---- serve_rate_limit_audit ----

  private val rlWindowSec = 604800L // 7 days
  private val rlLimit = 28L

  /** Sliding-window rate-limit audit: exact rolling event count per
    * user over a 7-day RANGE window (all rows within the last 604800
    * seconds, ties on the same second included by frame semantics in
    * both engines); emits only offending users with their breach
    * profile — total events, peak rolling rate, breach count, first
    * breach time.
    *
    * Scale shape: one per-user range window (users partition cleanly);
    * the output is the violation tail, not the fact table. */
  private[graft] def rateLimitAudit(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "events").select(col("user_id"),
      expr("unix_micros(cast(ts as timestamp)) div 1000000").as("sec"))
    val w = Window.partitionBy("user_id").orderBy("sec")
      .rangeBetween(-(rlWindowSec - 1), 0)
    e.withColumn("rolling", count(lit(1)).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        max("rolling").as("peak_rolling"),
        sum(when(col("rolling") > rlLimit, 1L).otherwise(0L))
          .as("n_breaches"),
        min(when(col("rolling") > rlLimit, col("sec")))
          .as("first_breach_sec"))
      .filter(col("n_breaches") > 0)
      .orderBy("user_id")
  }

  private val oServeRateLimit =
    s"""WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS sec
       |  FROM events),
       |r AS (SELECT user_id, sec, count(*) OVER (PARTITION BY user_id
       |    ORDER BY sec RANGE BETWEEN ${rlWindowSec - 1} PRECEDING
       |    AND CURRENT ROW) AS rolling FROM e)
       |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(max(rolling) AS BIGINT) AS peak_rolling,
       |  CAST(sum(CASE WHEN rolling > $rlLimit THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_breaches,
       |  min(CASE WHEN rolling > $rlLimit THEN sec END) AS first_breach_sec
       |FROM r GROUP BY user_id
       |HAVING sum(CASE WHEN rolling > $rlLimit THEN 1 ELSE 0 END) > 0
       |ORDER BY user_id""".stripMargin

  // ---- agg_cramers_v ----

  // shared scalar tower (exact-integer chi2 ingredients, then doubles)
  private val fPhi2 = "chi2d / CAST(n AS DOUBLE)"
  private val fPhi2c = "greatest(0e0, phi2 - " +
    "CAST((r-1)*(c-1) AS DOUBLE)/CAST(n-1 AS DOUBLE))"
  private val fRc = "CAST(r AS DOUBLE) - CAST((r-1)*(r-1) AS DOUBLE)/CAST(n-1 AS DOUBLE)"
  private val fCc = "CAST(c AS DOUBLE) - CAST((c-1)*(c-1) AS DOUBLE)/CAST(n-1 AS DOUBLE)"
  private val fV = "sqrt(phi2 / CAST(least(r-1, c-1) AS DOUBLE))"
  private val fVc = "sqrt(phi2c / least(rc - 1e0, cc - 1e0))"

  /** Cramér's V between event type and day-of-week (day_num % 7 — the
    * engine-portable weekday label): exact integer contingency table,
    * per-cell (o−e)²/e scale-to-long'd at 1e9 so the 35-cell chi2 sum
    * is order-independent, then V and the Bergsma bias-corrected V
    * through a shared double tower.
    *
    * Scale shape: one (type, dow) rollup; marginals broadcast back onto
    * the 35-cell table; the correction runs on one scalar row. */
  private[graft] def cramersV(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events").select(col("event_type"),
      expr("(unix_micros(cast(date_trunc('DAY', ts) as timestamp)) div 86400000000) % 7")
        .as("dow"))
    val cells = ev.groupBy("event_type", "dow").agg(count(lit(1)).as("o"))
    val rt = cells.groupBy("event_type").agg(sum("o").as("rt"))
    val ct = cells.groupBy("dow").agg(sum("o").as("ct"))
    val tot = cells.agg(sum("o").as("n"),
      countDistinct("event_type").as("r"), countDistinct("dow").as("c"))
    val agg = cells.join(broadcast(rt), "event_type")
      .join(broadcast(ct), "dow").crossJoin(broadcast(tot))
      .withColumn("e",
        col("rt").cast(dd) * col("ct").cast(dd) / col("n").cast(dd))
      .withColumn("cell_sc", floor(
        (col("o").cast(dd) - col("e")) * (col("o").cast(dd) - col("e"))
          / col("e") * lit(1e9) + lit(0.5)).cast(LongType))
      .groupBy("n", "r", "c").agg(sum("cell_sc").as("chi2_sc"))
    agg.withColumn("chi2d", expr("CAST(chi2_sc AS DOUBLE)/1e9"))
      .withColumn("phi2", expr(fPhi2))
      .withColumn("phi2c", expr(fPhi2c))
      .withColumn("rc", expr(fRc)).withColumn("cc", expr(fCc))
      .select(col("n"), col("r"), col("c"),
        trunc4(col("chi2d")).as("chi2"),
        trunc4(expr(fV)).as("cramers_v"),
        trunc4(expr(fVc)).as("cramers_v_corrected"))
  }

  private val oAggCramersV =
    s"""WITH ev AS (SELECT event_type,
       |    (epoch_us(date_trunc('day', ts)) // 86400000000) % 7 AS dow
       |  FROM events),
       |cells AS (SELECT event_type, dow, count(*) AS o
       |  FROM ev GROUP BY 1, 2),
       |rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt
       |  FROM cells GROUP BY 1),
       |ct AS (SELECT dow, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
       |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
       |    count(DISTINCT event_type) AS r, count(DISTINCT dow) AS c
       |  FROM cells),
       |sc AS (SELECT n, r, c, CAST(floor(
       |    (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE)*CAST(ct AS DOUBLE)/CAST(n AS DOUBLE))
       |    * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE)*CAST(ct AS DOUBLE)/CAST(n AS DOUBLE))
       |    / (CAST(rt AS DOUBLE)*CAST(ct AS DOUBLE)/CAST(n AS DOUBLE))
       |    * 1e9 + 5e-1) AS BIGINT) AS cell_sc
       |  FROM cells JOIN rt USING (event_type) JOIN ct USING (dow), tot),
       |agg AS (SELECT n, r, c, CAST(sum(cell_sc) AS BIGINT) AS chi2_sc
       |  FROM sc GROUP BY 1, 2, 3),
       |t1 AS (SELECT *, CAST(chi2_sc AS DOUBLE)/1e9 AS chi2d FROM agg),
       |t2 AS (SELECT *, ($fPhi2) AS phi2 FROM t1),
       |t3 AS (SELECT *, ($fPhi2c) AS phi2c FROM t2),
       |t4 AS (SELECT *, ($fRc) AS rc, ($fCc) AS cc FROM t3)
       |SELECT n, r, c, ${oTrunc4("chi2d")} AS chi2,
       |  ${oTrunc4(fV)} AS cramers_v,
       |  ${oTrunc4(fVc)} AS cramers_v_corrected
       |FROM t4""".stripMargin

  val queries: Map[String, QFn] = Map(
    "ts_pacf_durbin"        -> ((s, d) => pacfDurbin(s, d)),
    "serve_rate_limit_audit" -> ((s, d) => rateLimitAudit(s, d)),
    "agg_cramers_v"         -> ((s, d) => cramersV(s, d)))

  val oracles: Map[String, String] = Map(
    "ts_pacf_durbin"        -> oTsPacfDurbin,
    "serve_rate_limit_audit" -> oServeRateLimit,
    "agg_cramers_v"         -> oAggCramersV)
}
