package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 81 (SURVEY §2.28):
  *
  *  - `ts_rolling_origin_cv`: rolling-origin forecast cross-validation
  *    of an exponential smoother — the honest way to score a forecaster;
  *    α = 1/2 makes every smoothed state an EXACT dyadic rational.
  *  - `profile_sentinel_audit`: null-like sentinel scan ('', '{}', 0,
  *    whitespace) across string/numeric columns — the data-quality
  *    audit that catches fake-non-null columns.
  *  - `chp_standardized_rates`: directly standardized conversion rates
  *    (the epidemiology mix-adjustment) between the two user cohorts.
  */
object QRound9cd extends QueryPack {

  private val dd = DoubleType
  private val cvFirstOrigin = 20

  // ---- ts_rolling_origin_cv ----

  /** Rolling-origin CV of SES(α=1/2) per series: the smoothed state
    * s_t carried as the EXACT integer A_t = 2^{t-1}·s_t = x_1 +
    * Σ_{j≥2} 2^{j-2}·x_j (one prefix-sum window — no recursion
    * needed); at each origin t ≥ 20 the 1-step error is
    * (x_{t+1}·2^{t-1} − A_t)/2^{t-1}, numerator exact, one double
    * division, scale-to-long at 1e6; MAE and bias over the origins.
    *
    * Scale shape: one prefix window + one rollup per type. */
  private[graft] def rollingOriginCv(s: SparkSession, d: String): DataFrame = {
    val daily = QRound9b.evDaily(s, d)
    val w = Window.partitionBy("event_type").orderBy("day_num")
    val idx = daily.select(col("event_type"), col("cnt").as("x"),
      row_number().over(w).as("i"))
    val terms = idx.withColumn("term", expr(
      "CASE WHEN i = 1 THEN x ELSE x * CAST(pow(2e0, i - 2) AS BIGINT) END"))
    val wc = Window.partitionBy("event_type").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val acc = terms.withColumn("a", sum("term").over(wc))
      .withColumn("x_next", lead("x", 1).over(
        Window.partitionBy("event_type").orderBy("i")))
    val errs = acc.filter(col("i") >= cvFirstOrigin
        && col("x_next").isNotNull)
      .withColumn("e", (col("x_next").cast(dd)
        * expr("pow(2e0, i - 1)") - col("a").cast(dd))
        / expr("pow(2e0, i - 1)"))
      .withColumn("ae_sc", floor(abs(col("e")) * lit(1e6) + lit(0.5))
        .cast(LongType))
      .withColumn("e_sc", floor(col("e") * lit(1e6) + lit(0.5))
        .cast(LongType))
    errs.groupBy("event_type")
      .agg(count(lit(1)).as("n_origins"), sum("ae_sc").as("sae"),
        sum("e_sc").as("se"))
      .select(col("event_type"), col("n_origins"),
        trunc4(col("sae").cast(dd) / lit(1e6) / col("n_origins").cast(dd))
          .as("mae"),
        trunc4(col("se").cast(dd) / lit(1e6) / col("n_origins").cast(dd))
          .as("mean_bias"))
      .orderBy("event_type")
  }

  private val oTsRollingCv =
    s"""WITH daily AS (SELECT event_type,
       |    epoch_us(date_trunc('day', ts)) // 86400000000 AS day_num,
       |    count(*) AS cnt FROM events GROUP BY 1, 2),
       |idx AS (SELECT event_type, cnt AS x,
       |    row_number() OVER (PARTITION BY event_type ORDER BY day_num)
       |      AS i FROM daily),
       |terms AS (SELECT event_type, x, i,
       |    CASE WHEN i = 1 THEN x
       |      ELSE x * CAST(pow(2e0, i - 2) AS BIGINT) END AS term
       |  FROM idx),
       |acc AS (SELECT event_type, x, i,
       |    CAST(sum(term) OVER (PARTITION BY event_type ORDER BY i
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS a,
       |    lead(x) OVER (PARTITION BY event_type ORDER BY i) AS x_next
       |  FROM terms),
       |errs AS (SELECT event_type,
       |    (CAST(x_next AS DOUBLE)*pow(2e0, i - 1) - CAST(a AS DOUBLE))
       |      /pow(2e0, i - 1) AS e
       |  FROM acc WHERE i >= $cvFirstOrigin AND x_next IS NOT NULL),
       |sc AS (SELECT event_type, count(*) AS n_origins,
       |    CAST(sum(CAST(floor(abs(e)*1e6 + 5e-1) AS BIGINT)) AS BIGINT)
       |      AS sae,
       |    CAST(sum(CAST(floor(e*1e6 + 5e-1) AS BIGINT)) AS BIGINT) AS se
       |  FROM errs GROUP BY 1)
       |SELECT event_type, CAST(n_origins AS BIGINT) AS n_origins,
       |  ${oTrunc4("CAST(sae AS DOUBLE)/1e6/CAST(n_origins AS DOUBLE)")}
       |    AS mae,
       |  ${oTrunc4("CAST(se AS DOUBLE)/1e6/CAST(n_origins AS DOUBLE)")}
       |    AS mean_bias
       |FROM sc ORDER BY event_type""".stripMargin

  // ---- profile_sentinel_audit ----

  /** Sentinel scan: for each audited column, how many values are
    * null-LIKE without being null — empty strings, '{}' stubs,
    * whitespace-only, zero/negative money, epoch-zero-adjacent
    * timestamps. Exact counts; the audit that catches columns that
    * pass NOT NULL checks while carrying no information.
    *
    * Scale shape: one conditional aggregate per table — map-side. */
  private[graft] def sentinelAudit(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
    val docs = t(s, d, "documents")
    val evA = ev.agg(count(lit(1)).as("n_rows"),
        sum(when(col("props") === "{}", 1L).otherwise(0L)).as("empty_json"),
        sum(when(trim(col("props")) === "", 1L).otherwise(0L))
          .as("blank_str"),
        sum(when(col("value") <= 0.0, 1L).otherwise(0L)).as("nonpos_num"))
      .select(lit("events").as("tbl"), col("n_rows"), col("empty_json"),
        col("blank_str"), col("nonpos_num"))
    val docA = docs.agg(count(lit(1)).as("n_rows"),
        sum(when(col("text") === "", 1L).otherwise(0L)).as("blank_str"),
        sum(when(col("n_chars") <= 0, 1L).otherwise(0L)).as("nonpos_num"))
      .select(lit("documents").as("tbl"), col("n_rows"),
        lit(0L).as("empty_json"), col("blank_str"), col("nonpos_num"))
    evA.unionByName(docA)
      .withColumn("sentinel_share", trunc4(
        (col("empty_json") + col("blank_str") + col("nonpos_num")).cast(dd)
          / col("n_rows").cast(dd)))
      .orderBy("tbl")
  }

  private val oProfileSentinel =
    s"""SELECT * FROM (
       |SELECT 'documents' AS tbl, count(*) AS n_rows,
       |  CAST(0 AS BIGINT) AS empty_json,
       |  CAST(sum(CASE WHEN text = '' THEN 1 ELSE 0 END) AS BIGINT)
       |    AS blank_str,
       |  CAST(sum(CASE WHEN n_chars <= 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS nonpos_num,
       |  ${oTrunc4("CAST(sum(CASE WHEN text = '' THEN 1 ELSE 0 END) + sum(CASE WHEN n_chars <= 0 THEN 1 ELSE 0 END) AS DOUBLE)/count(*)")}
       |    AS sentinel_share
       |FROM documents
       |UNION ALL
       |SELECT 'events', count(*),
       |  CAST(sum(CASE WHEN props = '{}' THEN 1 ELSE 0 END) AS BIGINT),
       |  CAST(sum(CASE WHEN trim(props) = '' THEN 1 ELSE 0 END) AS BIGINT),
       |  CAST(sum(CASE WHEN value <= 0e0 THEN 1 ELSE 0 END) AS BIGINT),
       |  ${oTrunc4("CAST(sum(CASE WHEN props = '{}' THEN 1 ELSE 0 END) + sum(CASE WHEN trim(props) = '' THEN 1 ELSE 0 END) + sum(CASE WHEN value <= 0e0 THEN 1 ELSE 0 END) AS DOUBLE)/count(*)")}
       |FROM events
       |) ORDER BY tbl""".stripMargin

  // ---- chp_standardized_rates ----

  /** Direct standardization: users split into cohorts by user_id % 2;
    * per activity-volume bucket (total events: <40, 40–79, ≥80) each
    * cohort's conversion rate is re-weighted by the POOLED bucket mix,
    * so the comparison is mix-adjusted — the epidemiology classic.
    * All rates scale-to-long'd at 1e12 off exact integer counts.
    *
    * Scale shape: one user rollup, bucket×cohort cells, pooled weights
    * broadcast. */
  private[graft] def standardizedRates(s: SparkSession, d: String): DataFrame = {
    val users = t(s, d, "events").groupBy("user_id")
      .agg(count(lit(1)).as("n_ev"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
      .withColumn("cohort", (col("user_id") % 2).cast(IntegerType))
      .withColumn("bucket", expr(
        "CASE WHEN n_ev < 40 THEN 0 WHEN n_ev < 80 THEN 1 ELSE 2 END"))
    val cells = users.groupBy("cohort", "bucket")
      .agg(count(lit(1)).as("n"), sum("conv").as("p"))
    val wts = users.groupBy("bucket").agg(count(lit(1)).as("wn"))
    val tot = users.agg(count(lit(1)).as("n_all"))
    val adj = cells.join(broadcast(wts), "bucket")
      .crossJoin(broadcast(tot))
      .withColumn("term_sc", floor(
        col("p").cast(dd) / col("n").cast(dd)
          * col("wn").cast(dd) / col("n_all").cast(dd) * lit(1e12)
          + lit(0.5)).cast(LongType))
      .groupBy("cohort").agg(sum("term_sc").as("std_sc"),
        sum("p").as("raw_p"), sum("n").as("raw_n"))
    adj.select(col("cohort"),
        col("raw_n").as("n_users"),
        trunc4(col("raw_p").cast(dd) / col("raw_n").cast(dd))
          .as("crude_rate"),
        trunc4(col("std_sc").cast(dd) / lit(1e12)).as("standardized_rate"))
      .orderBy("cohort")
  }

  private val oChpStandardized =
    s"""WITH users AS (SELECT user_id, count(*) AS n_ev,
       |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS conv
       |  FROM events GROUP BY 1),
       |ub AS (SELECT user_id, conv, CAST(user_id % 2 AS INT) AS cohort,
       |    CASE WHEN n_ev < 40 THEN 0 WHEN n_ev < 80 THEN 1 ELSE 2 END
       |      AS bucket
       |  FROM users),
       |cells AS (SELECT cohort, bucket, count(*) AS n,
       |    CAST(sum(conv) AS BIGINT) AS p FROM ub GROUP BY 1, 2),
       |wts AS (SELECT bucket, count(*) AS wn FROM ub GROUP BY 1),
       |tot AS (SELECT count(*) AS n_all FROM ub),
       |adj AS (SELECT cohort,
       |    CAST(sum(CAST(floor(CAST(p AS DOUBLE)/CAST(n AS DOUBLE)
       |      * CAST(wn AS DOUBLE)/CAST(n_all AS DOUBLE) * 1e12 + 5e-1)
       |      AS BIGINT)) AS BIGINT) AS std_sc,
       |    CAST(sum(p) AS BIGINT) AS raw_p, CAST(sum(n) AS BIGINT)
       |      AS raw_n
       |  FROM cells JOIN wts USING (bucket), tot GROUP BY 1)
       |SELECT cohort, raw_n AS n_users,
       |  ${oTrunc4("CAST(raw_p AS DOUBLE)/CAST(raw_n AS DOUBLE)")}
       |    AS crude_rate,
       |  ${oTrunc4("CAST(std_sc AS DOUBLE)/1e12")} AS standardized_rate
       |FROM adj ORDER BY cohort""".stripMargin

  val queries: Map[String, QFn] = Map(
    "ts_rolling_origin_cv"   -> ((s, d) => rollingOriginCv(s, d)),
    "profile_sentinel_audit" -> ((s, d) => sentinelAudit(s, d)),
    "chp_standardized_rates" -> ((s, d) => standardizedRates(s, d)))

  val oracles: Map[String, String] = Map(
    "ts_rolling_origin_cv"   -> oTsRollingCv,
    "profile_sentinel_audit" -> oProfileSentinel,
    "chp_standardized_rates" -> oChpStandardized)
}
