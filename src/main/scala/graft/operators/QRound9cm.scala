package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 90 (SURVEY §2.28):
  *
  *  - `agg_jarque_bera`: Jarque–Bera normality test per event type on
  *    the daily count series — skewness² + excess-kurtosis² rolled
  *    into the one χ²(2) statistic monitoring dashboards alarm on.
  *  - `ts_turning_points`: turning-point test of series randomness —
  *    the count of local extrema vs the 2(n−2)/3 expectation.
  *  - `ts_sma_crossover`: SMA(3)/SMA(7) crossover signal extraction
  *    (golden/death crosses) in exact integer arithmetic.
  */
object QRound9cm extends QueryPack {

  private val dd = DoubleType

  private def evDailyCnt(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"),
        expr("unix_micros(cast(date_trunc('DAY', ts) as timestamp)) div 86400000000")
          .as("day_num"))
      .agg(count(lit(1)).as("y"))

  // ---- agg_jarque_bera ----

  /** Jarque–Bera per type: raw power sums Σy..Σy⁴ are exact BIGINTs
    * over the bounded daily spine; the central moments, skewness g₁,
    * excess kurtosis g₂−3 and JB = n/6·(g₁² + (g₂−3)²/4) combine them
    * in ONE shared double spelling, so both engines run identical
    * doubles. Verdict vs the χ²(2) 5% literal (5.991e0).
    *
    * Scale shape: the daily rollup is the shuffle; the moment rollup is
    * per-type over ~a month of rows. */
  private[graft] def jarqueBera(events: DataFrame): DataFrame = {
    val mo = evDailyCnt(events).groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("y").as("s1"),
        sum(col("y") * col("y")).as("s2"),
        sum(col("y") * col("y") * col("y")).as("s3"),
        sum(col("y") * col("y") * col("y") * col("y")).as("s4"))
    // moments about the mean, one spelling: mk = E[y^k] − combinations
    val base = mo
      .withColumn("nd", col("n").cast(dd))
      .withColumn("m", col("s1").cast(dd) / col("n").cast(dd))
      .withColumn("m2", col("s2").cast(dd) / col("nd")
        - col("m") * col("m"))
      .withColumn("m3", col("s3").cast(dd) / col("nd")
        - lit(3e0) * col("m") * (col("s2").cast(dd) / col("nd"))
        + lit(2e0) * col("m") * col("m") * col("m"))
      .withColumn("m4", col("s4").cast(dd) / col("nd")
        - lit(4e0) * col("m") * (col("s3").cast(dd) / col("nd"))
        + lit(6e0) * col("m") * col("m") * (col("s2").cast(dd) / col("nd"))
        - lit(3e0) * col("m") * col("m") * col("m") * col("m"))
      .withColumn("g1", col("m3") / sqrt(col("m2") * col("m2") * col("m2")))
      .withColumn("g2e", col("m4") / (col("m2") * col("m2")) - lit(3e0))
      .withColumn("jb", col("nd") / lit(6e0) *
        (col("g1") * col("g1") + col("g2e") * col("g2e") / lit(4e0)))
    base.select(col("event_type"), col("n").as("n_days"),
        trunc4(col("g1")).as("skewness"),
        trunc4(col("g2e")).as("excess_kurtosis"),
        trunc4(col("jb")).as("jb_stat"))
      .withColumn("reject_normal_5pct",
        (col("jb_stat") > lit(5.991)).cast(IntegerType))
      .orderBy("event_type")
  }

  private def aggJarqueBera(s: SparkSession, d: String): DataFrame =
    jarqueBera(t(s, d, "events"))

  private val oAggJarqueBera = {
    val m = "CAST(s1 AS DOUBLE)/nd"
    val jbExpr = "nd/6e0*(g1*g1 + g2e*g2e/4e0)"
    s"""WITH daily AS (SELECT event_type,
       |    epoch_us(date_trunc('day', ts)) // 86400000000 AS day_num,
       |    count(*) AS y FROM events GROUP BY 1, 2),
       |mo AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(y) AS BIGINT) AS s1, CAST(sum(y*y) AS BIGINT) AS s2,
       |    CAST(sum(y*y*y) AS BIGINT) AS s3,
       |    CAST(sum(y*y*y*y) AS BIGINT) AS s4
       |  FROM daily GROUP BY 1),
       |b1 AS (SELECT event_type, n, CAST(n AS DOUBLE) AS nd,
       |    s1, s2, s3, s4, $m AS m FROM mo),
       |b2 AS (SELECT *,
       |    CAST(s2 AS DOUBLE)/nd - m*m AS m2,
       |    CAST(s3 AS DOUBLE)/nd - 3e0*m*(CAST(s2 AS DOUBLE)/nd)
       |      + 2e0*m*m*m AS m3,
       |    CAST(s4 AS DOUBLE)/nd - 4e0*m*(CAST(s3 AS DOUBLE)/nd)
       |      + 6e0*m*m*(CAST(s2 AS DOUBLE)/nd) - 3e0*m*m*m*m AS m4
       |  FROM b1),
       |b3 AS (SELECT *, m3/sqrt(m2*m2*m2) AS g1,
       |    m4/(m2*m2) - 3e0 AS g2e FROM b2)
       |SELECT event_type, n AS n_days, ${oTrunc4("g1")} AS skewness,
       |  ${oTrunc4("g2e")} AS excess_kurtosis,
       |  ${oTrunc4(jbExpr)} AS jb_stat,
       |  CAST(CASE WHEN ${oTrunc4(jbExpr)} > 5.991e0 THEN 1 ELSE 0 END
       |    AS INT) AS reject_normal_5pct
       |FROM b3 ORDER BY event_type""".stripMargin
  }

  // ---- ts_turning_points ----

  /** Turning-point randomness test per type: T = interior days where
    * the series strictly changes direction ((y−prev)(next−y) < 0 —
    * exact integer product), E[T] = 2(n−2)/3 and
    * Var[T] = (16n−29)/90 under i.i.d.; z = (T − E)/σ from exact
    * integers, verdict |z| ≤ 1.96.
    *
    * Scale shape: daily rollup + per-type lag/lead windows; the tally
    * is one rollup per type. */
  private[graft] def turningPoints(events: DataFrame): DataFrame = {
    val wd = Window.partitionBy("event_type").orderBy("day_num")
    val tp = evDailyCnt(events)
      .withColumn("dp", col("y") - lag("y", 1).over(wd))
      .withColumn("dn", lead("y", 1).over(wd) - col("y"))
      .filter(col("dp").isNotNull && col("dn").isNotNull)
      .groupBy("event_type")
      .agg((count(lit(1)) + 2).as("n"),
        sum((col("dp") * col("dn") < 0).cast(LongType)).as("t_pts"))
    tp.select(col("event_type"), col("n").as("n_days"), col("t_pts"),
        trunc4((col("t_pts").cast(dd)
          - lit(2e0) * (col("n") - 2).cast(dd) / lit(3e0)) /
          sqrt((lit(16e0) * col("n").cast(dd) - lit(29e0)) / lit(9e1)))
          .as("z_score"))
      .withColumn("random_5pct",
        (abs(col("z_score")) <= lit(1.96)).cast(IntegerType))
      .orderBy("event_type")
  }

  private def tsTurningPoints(s: SparkSession, d: String): DataFrame =
    turningPoints(t(s, d, "events"))

  private val oTsTurningPoints = {
    val zExpr = "(CAST(t_pts AS DOUBLE) - 2e0*CAST(n - 2 AS DOUBLE)/3e0)" +
      "/sqrt((16e0*CAST(n AS DOUBLE) - 29e0)/9e1)"
    s"""WITH daily AS (SELECT event_type,
       |    epoch_us(date_trunc('day', ts)) // 86400000000 AS day_num,
       |    count(*) AS y FROM events GROUP BY 1, 2),
       |dl AS (SELECT event_type,
       |    y - lag(y) OVER (PARTITION BY event_type ORDER BY day_num)
       |      AS dp,
       |    lead(y) OVER (PARTITION BY event_type ORDER BY day_num) - y
       |      AS dn
       |  FROM daily),
       |tp AS (SELECT event_type, CAST(count(*) + 2 AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN dp*dn < 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS t_pts
       |  FROM dl WHERE dp IS NOT NULL AND dn IS NOT NULL GROUP BY 1)
       |SELECT event_type, n AS n_days, t_pts, ${oTrunc4(zExpr)} AS z_score,
       |  CAST(CASE WHEN abs(${oTrunc4(zExpr)}) <= 1.96e0 THEN 1 ELSE 0 END
       |    AS INT) AS random_5pct
       |FROM tp ORDER BY event_type""".stripMargin
  }

  // ---- ts_sma_crossover ----

  /** SMA(3)/SMA(7) crossover signals per type in exact integers:
    * diff = 7·(3-day sum) − 3·(7-day sum) (the LCM-21 spelling — no
    * division), valid once 7 days exist; a crossover fires when
    * sign(diff) strictly flips (zeros break the streak, matching the
    * trading convention of waiting for a definite side). Emits per
    * type the evaluated-day count, crossover count, last crossover
    * day, and the final signal side.
    *
    * Scale shape: two frame windows + one lag, all partitioned by
    * type over the bounded day spine; one rollup. */
  private[graft] def smaCrossover(events: DataFrame): DataFrame = {
    val wd = Window.partitionBy("event_type").orderBy("day_num")
    val w3 = wd.rowsBetween(-2, 0)
    val w7 = wd.rowsBetween(-6, 0)
    val ser = evDailyCnt(events)
      .withColumn("i", row_number().over(wd))
      .withColumn("diff",
        lit(7) * sum("y").over(w3) - lit(3) * sum("y").over(w7))
      .filter(col("i") >= 7)
      .withColumn("sgn", signum(col("diff").cast(dd)).cast(LongType))
      .withColumn("psgn", lag("sgn", 1).over(wd))
      .withColumn("xover",
        (col("psgn").isNotNull && col("sgn") * col("psgn") === -1)
          .cast(LongType))
    ser.groupBy("event_type")
      .agg(count(lit(1)).as("n_eval"), sum("xover").as("n_cross"),
        max(when(col("xover") === 1, col("day_num"))).as("last_cross_day"),
        max(struct(col("day_num"), col("sgn"))).as("mx"))
      .select(col("event_type"), col("n_eval"), col("n_cross"),
        col("last_cross_day"), col("mx.sgn").as("final_signal"))
      .orderBy("event_type")
  }

  private def tsSmaCrossover(s: SparkSession, d: String): DataFrame =
    smaCrossover(t(s, d, "events"))

  private val oTsSmaCrossover =
    s"""WITH daily AS (SELECT event_type,
       |    epoch_us(date_trunc('day', ts)) // 86400000000 AS day_num,
       |    count(*) AS y FROM events GROUP BY 1, 2),
       |sm AS (SELECT event_type, day_num,
       |    row_number() OVER (PARTITION BY event_type ORDER BY day_num)
       |      AS i,
       |    7*CAST(sum(y) OVER (PARTITION BY event_type ORDER BY day_num
       |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
       |    - 3*CAST(sum(y) OVER (PARTITION BY event_type ORDER BY day_num
       |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS diff
       |  FROM daily),
       |sg AS (SELECT event_type, day_num, i,
       |    CAST(sign(diff) AS BIGINT) AS sgn FROM sm WHERE i >= 7),
       |cr AS (SELECT event_type, day_num, sgn,
       |    lag(sgn) OVER (PARTITION BY event_type ORDER BY day_num)
       |      AS psgn
       |  FROM sg),
       |fl AS (SELECT event_type, day_num, sgn,
       |    CASE WHEN psgn IS NOT NULL AND sgn*psgn = -1 THEN 1 ELSE 0 END
       |      AS xover FROM cr)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_eval,
       |  CAST(sum(xover) AS BIGINT) AS n_cross,
       |  max(CASE WHEN xover = 1 THEN day_num END) AS last_cross_day,
       |  CAST(max_by(sgn, day_num) AS BIGINT) AS final_signal
       |FROM fl GROUP BY 1 ORDER BY event_type""".stripMargin

  val queries: Map[String, QFn] = Map(
    "agg_jarque_bera"  -> aggJarqueBera _,
    "ts_turning_points" -> tsTurningPoints _,
    "ts_sma_crossover" -> tsSmaCrossover _)

  val oracles: Map[String, String] = Map(
    "agg_jarque_bera"  -> oAggJarqueBera,
    "ts_turning_points" -> oTsTurningPoints,
    "ts_sma_crossover" -> oTsSmaCrossover)
}
