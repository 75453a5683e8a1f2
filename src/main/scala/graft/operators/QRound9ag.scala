package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Round-9 extension wave 32 (SURVEY §2.28):
  *
  *  - `agg_skew_kurtosis`: per-group skewness + excess kurtosis from
  *    exact integer power sums — the distribution-shape profile a
  *    feature store publishes next to mean/stddev.
  *  - `ts_spc_rules`: Western Electric control-chart rules (1σ/2σ/3σ
  *    zone tests + 8-in-a-row) over the daily event-value series — the
  *    alerting layer of an operational metrics pipeline.
  *  - `serve_session_replay`: per-user ordered event timeline with
  *    dwell times and session numbers for a probe set — the
  *    "GET /users/:id/timeline" debugging read path.
  */
object QRound9ag extends QueryPack {

  // ---- agg_skew_kurtosis ----

  /** Per-returnflag skewness and excess kurtosis of l_extendedprice.
    *
    * Determinism: prices become exact integer cents, power sums stay in
    * integer decimal (c⁴ ≤ 1.2e28, Σ ≤ 7e33 — fits DECIMAL(38,0) and
    * DuckDB's HUGEINT), and both engines then run the IDENTICAL
    * parenthesized double expression on the exactly-converted sums.
    * m2^1.5 is spelled m2·sqrt(m2) (sqrt is correctly-rounded IEEE;
    * pow is libm-dependent). Skew/kurtosis are scale-invariant, so
    * cents vs dollars cancels out.
    *
    * Scale shape: one partial-aggregable pass — the power sums combine
    * associatively map-side exactly like plain sums. */
  private[graft] def skewKurtosis(lineitem: DataFrame): DataFrame = {
    // 128-bit integer power sums (OPTIMIZATION r16): the decimal
    // spelling multiplied DECIMAL(38,0)s per row (BigDecimal allocation
    // chains) and summed into BigDecimal buffers. Cents are an exact
    // BIGINT (≤ ~1.1e7), c² fits a long exactly (≤ ~1.2e14); c³/c⁴ are
    // accumulated as exact 128-bit PRODUCTS (SumProd128) — identical
    // values, identical DECIMAL(38,0) result type, same Σc⁴ ≤ DECIMAL(38)
    // headroom bound as before.
    val cl = cents(col("l_extendedprice"))
    val cl2 = cl * cl
    val agg = lineitem
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum128(cl, 0).as("s1"),
        sumProd128(cl, cl, 0).as("s2"),
        sumProd128(cl2, cl, 0).as("s3"),
        sumProd128(cl2, cl2, 0).as("s4"))
    val n  = col("n").cast(DoubleType)
    val s1 = col("s1").cast(DoubleType)
    val s2 = col("s2").cast(DoubleType)
    val s3 = col("s3").cast(DoubleType)
    val s4 = col("s4").cast(DoubleType)
    val m1 = s1 / n
    val m2 = (s2 / n) - (m1 * m1)
    val m3 = (s3 / n) - (lit(3.0) * m1 * (s2 / n)) + (lit(2.0) * m1 * m1 * m1)
    val m4 = (s4 / n) - (lit(4.0) * m1 * (s3 / n)) +
      (lit(6.0) * m1 * m1 * (s2 / n)) - (lit(3.0) * m1 * m1 * m1 * m1)
    agg.select(col("l_returnflag"), col("n"),
        trunc6(m3 / (m2 * sqrt(m2))).as("skewness"),
        trunc6((m4 / (m2 * m2)) - lit(3.0)).as("kurtosis_ex"))
      .orderBy("l_returnflag")
  }

  private def aggSkewKurtosis(s: SparkSession, d: String): DataFrame =
    skewKurtosis(t(s, d, "lineitem"))

  private val oAggSkewKurtosis =
    s"""WITH c AS (SELECT l_returnflag, CAST(CAST(
       |      CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
       |      AS HUGEINT) AS c FROM lineitem),
       |a AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(c) AS DOUBLE) AS s1,
       |    CAST(sum(c * c) AS DOUBLE) AS s2,
       |    CAST(sum(c * c * c) AS DOUBLE) AS s3,
       |    CAST(sum(c * c * c * c) AS DOUBLE) AS s4
       |  FROM c GROUP BY 1),
       |m AS (SELECT l_returnflag, n,
       |    s1 / n AS m1, s2 / n AS d2, s3 / n AS d3, s4 / n AS d4
       |  FROM a),
       |mm AS (SELECT l_returnflag, n, m1,
       |    d2 - (m1 * m1) AS m2,
       |    d3 - (3e0 * m1 * d2) + (2e0 * m1 * m1 * m1) AS m3,
       |    d4 - (4e0 * m1 * d3) + (6e0 * m1 * m1 * d2)
       |      - (3e0 * m1 * m1 * m1 * m1) AS m4
       |  FROM m)
       |SELECT l_returnflag, n,
       |  ${oTrunc6("m3 / (m2 * sqrt(m2))")} AS skewness,
       |  ${oTrunc6("(m4 / (m2 * m2)) - 3e0")} AS kurtosis_ex
       |FROM mm ORDER BY l_returnflag""".stripMargin

  // ---- ts_spc_rules ----

  /** Western Electric control-chart rules over the daily per-type event
    * value series: zone z-scores (trunc4'd BEFORE any threshold compare
    * so the cut lands identically in both engines), then
    * r1 = |z| > 3; r2 = 2 of 3 consecutive beyond 2σ same side;
    * r3 = 4 of 5 beyond 1σ same side; r4 = 8 consecutive same side.
    * Emits only the alerting points.
    *
    * Scale shape: day-rollup is one partial aggregate; per-series mean/σ
    * come from exact decimal sums joined back on the tiny type key
    * (broadcast); every window partitions by event_type — at deployment
    * the partition key is (metric, series) so state per task is one
    * series, never the firehose. */
  private[graft] def spcRules(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("day"))
      .agg(sum4(col("value")).as("x"))
    val stats = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(D184)).as("s1"),
        sum((col("x").cast(D184) * col("x").cast(D184))
          .cast(DecimalType(38, 8))).as("s2"))
      .select(col("event_type"),
        (col("s1").cast(DoubleType) / col("n").cast(DoubleType)).as("mu"),
        sqrt((col("s2").cast(DoubleType) / col("n").cast(DoubleType)) -
          ((col("s1").cast(DoubleType) / col("n").cast(DoubleType)) *
            (col("s1").cast(DoubleType) / col("n").cast(DoubleType))))
          .as("sigma"))
    val z = daily.join(broadcast(stats), Seq("event_type"))
      .select(col("event_type"), col("day"),
        trunc4((col("x") - col("mu")) / col("sigma")).as("z"))
    val w = Window.partitionBy("event_type").orderBy("day")
    def lastN(c: org.apache.spark.sql.Column, nRows: Int) =
      sum(c.cast(LongType)).over(w.rowsBetween(-(nRows - 1), 0))
    val cnt = count(lit(1)).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val flagged = z
      .withColumn("i", cnt)
      .withColumn("hi2", lastN(col("z") > 2.0, 3))
      .withColumn("lo2", lastN(col("z") < -2.0, 3))
      .withColumn("hi1", lastN(col("z") > 1.0, 5))
      .withColumn("lo1", lastN(col("z") < -1.0, 5))
      .withColumn("hi0", lastN(col("z") > 0.0, 8))
      .withColumn("lo0", lastN(col("z") < 0.0, 8))
      .select(col("event_type"), col("day"), col("z"),
        (abs(col("z")) > 3.0).cast(IntegerType).as("r1"),
        (col("i") >= 3 && (col("hi2") >= 2 || col("lo2") >= 2))
          .cast(IntegerType).as("r2"),
        (col("i") >= 5 && (col("hi1") >= 4 || col("lo1") >= 4))
          .cast(IntegerType).as("r3"),
        (col("i") >= 8 && (col("hi0") === 8 || col("lo0") === 8))
          .cast(IntegerType).as("r4"))
    flagged
      .filter(col("r1") + col("r2") + col("r3") + col("r4") > 0)
      .orderBy("event_type", "day")
  }

  private def tsSpcRules(s: SparkSession, d: String): DataFrame =
    spcRules(t(s, d, "events"))

  private val oTsSpcRules =
    s"""WITH daily AS (SELECT event_type, date_trunc('hour', ts) AS day,
       |    ${oSum4("value")} AS x FROM events GROUP BY 1, 2),
       |st AS (SELECT event_type, count(*) AS n,
       |    CAST(sum(CAST(x AS DECIMAL(18,4))) AS DOUBLE) AS s1,
       |    CAST(sum(CAST(CAST(x AS DECIMAL(18,4)) * CAST(x AS DECIMAL(18,4))
       |      AS DECIMAL(38,8))) AS DOUBLE) AS s2
       |  FROM daily GROUP BY 1),
       |zz AS (SELECT d.event_type, d.day,
       |    ${oTrunc4("(d.x - (st.s1 / st.n)) / sqrt((st.s2 / st.n) - ((st.s1 / st.n) * (st.s1 / st.n)))")} AS z
       |  FROM daily d JOIN st ON d.event_type = st.event_type),
       |f AS (SELECT event_type, day, z,
       |    count(*) OVER (PARTITION BY event_type ORDER BY day
       |      ROWS UNBOUNDED PRECEDING) AS i,
       |    sum(CASE WHEN z > 2e0 THEN 1 ELSE 0 END) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS hi2,
       |    sum(CASE WHEN z < -2e0 THEN 1 ELSE 0 END) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS lo2,
       |    sum(CASE WHEN z > 1e0 THEN 1 ELSE 0 END) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS hi1,
       |    sum(CASE WHEN z < -1e0 THEN 1 ELSE 0 END) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS lo1,
       |    sum(CASE WHEN z > 0e0 THEN 1 ELSE 0 END) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS hi0,
       |    sum(CASE WHEN z < 0e0 THEN 1 ELSE 0 END) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS lo0
       |  FROM zz),
       |r AS (SELECT event_type, day, z,
       |    CASE WHEN abs(z) > 3e0 THEN 1 ELSE 0 END AS r1,
       |    CASE WHEN i >= 3 AND (hi2 >= 2 OR lo2 >= 2) THEN 1 ELSE 0 END AS r2,
       |    CASE WHEN i >= 5 AND (hi1 >= 4 OR lo1 >= 4) THEN 1 ELSE 0 END AS r3,
       |    CASE WHEN i >= 8 AND (hi0 = 8 OR lo0 = 8) THEN 1 ELSE 0 END AS r4
       |  FROM f)
       |SELECT event_type, day, z, r1, r2, r3, r4
       |FROM r WHERE r1 + r2 + r3 + r4 > 0
       |ORDER BY event_type, day""".stripMargin

  // ---- serve_session_replay ----

  // present at every sf: sf0.001's user domain is only 0..14
  private val replayUsers = Seq(3L, 7L, 11L)

  /** Ordered event-timeline replay for 3 probe users: per-event index,
    * dwell seconds since the previous event, and a 30-minute-gap session
    * number — the support-debugging "show me what this user did" read.
    *
    * Scale shape: the probe filter prunes to 3 users BEFORE any shuffle
    * (predicate pushdown to the scan); windows partition by user_id over
    * the handful of surviving rows. */
  private[graft] def sessionReplay(events: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy("us", "event_id")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .filter(col("user_id").isin(replayUsers: _*))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts"), expr("unix_micros(cast(ts as timestamp))").as("us"))
      .withColumn("idx", row_number().over(wOrd).cast(LongType))
      .withColumn("prev_us", lag("us", 1).over(wOrd))
      .withColumn("dwell_s",
        coalesce(expr("(us - prev_us) div 1000000"), lit(0L)))
      .withColumn("session_no",
        sum((col("prev_us").isNull ||
          col("us") - col("prev_us") > 1800000000L).cast(LongType))
          .over(wRun))
      .select("user_id", "idx", "event_id", "event_type", "ts",
        "dwell_s", "session_no")
      .orderBy("user_id", "idx")
  }

  private def serveSessionReplay(s: SparkSession, d: String): DataFrame =
    sessionReplay(t(s, d, "events"))

  private val oServeSessionReplay =
    s"""WITH e AS (SELECT user_id, event_id, event_type, ts,
       |    epoch_us(ts) AS us FROM events
       |  WHERE user_id IN (${replayUsers.mkString(", ")})),
       |l AS (SELECT *,
       |    CAST(row_number() OVER (PARTITION BY user_id
       |      ORDER BY us, event_id) AS BIGINT) AS idx,
       |    lag(us) OVER (PARTITION BY user_id
       |      ORDER BY us, event_id) AS prev_us FROM e),
       |f AS (SELECT *,
       |    CAST(coalesce((us - prev_us) // 1000000, 0) AS BIGINT)
       |      AS dwell_s,
       |    CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
       |      THEN 1 ELSE 0 END AS new_sess FROM l)
       |SELECT user_id, idx, event_id, event_type, ts, dwell_s,
       |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
       |FROM f ORDER BY user_id, idx""".stripMargin

  val queries: Map[String, QFn] = Map(
    "agg_skew_kurtosis"    -> aggSkewKurtosis _,
    "ts_spc_rules"         -> tsSpcRules _,
    "serve_session_replay" -> serveSessionReplay _)

  val oracles: Map[String, String] = Map(
    "agg_skew_kurtosis"    -> oAggSkewKurtosis,
    "ts_spc_rules"         -> oTsSpcRules,
    "serve_session_replay" -> oServeSessionReplay)
}
