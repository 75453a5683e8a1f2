package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 61 (SURVEY §2.28):
  *
  *  - `dedup_best_of_cluster`: quality-aware canonical election — inside
  *    each near-dup cluster keep the highest-TTR document instead of the
  *    min-id, and report where the two policies disagree; the curation
  *    decision that turns dedup from arbitrary to quality-preserving.
  *  - `ts_changepoint_binseg`: binary-segmentation changepoint — the
  *    split maximizing the between-segment variance-reduction gain,
  *    from exact prefix sums (the CUSUM key detects drift; this one
  *    localizes the single best break).
  *  - `fn_interval_arith`: calendar arithmetic parity — quarter/ISO
  *    week/day-of-week, add_months, last_day, make_date round-trip —
  *    the date surfaces both engines must agree on.
  */
object QRound9bj extends QueryPack {

  // ---- dedup_best_of_cluster ----

  /** Canonical election by quality: clusters from the shared memoized
    * CC labels; per document the TTR proxy distinct/total tokens as the
    * exact scaled integer (distinct·1e12 div total); within each ≥2
    * cluster the keeper is argmax (score, then min doc_id — the
    * max-struct with negated id). Reports each cluster's keeper, the
    * min-id keeper it would have been, whether the policies disagree,
    * and the exact scaled quality gain.
    *
    * Scale shape: labels and features join doc-keyed; per-cluster
    * argmax is a bounded struct-max aggregate. */
  private[graft] def bestOfCluster(s: SparkSession, d: String): DataFrame = {
    val dd = DoubleType
    val lab = QRound4.ccLabels(s, d).withColumnRenamed("id", "doc_id")
    val score = t(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        expr("(size(array_distinct(toks)) * 1000000000000) div size(toks)")
          .as("q"))
    val members = lab.join(score, "doc_id")
      .select(col("lab").as("cluster_id"), col("doc_id"), col("q"))
    members.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("q").as("q"), (-col("doc_id")).as("nid"))).as("best"),
        min("doc_id").as("minid_doc"),
        min(struct(col("doc_id").as("doc_id"), col("q").as("q"))).as("mi"))
      .filter(col("n_members") >= 2)
      .select(col("cluster_id"), col("n_members"),
        (-col("best.nid")).cast(LongType).as("kept_doc"),
        col("minid_doc"),
        ((-col("best.nid")).cast(LongType) =!= col("minid_doc"))
          .cast(IntegerType).as("policy_differs"),
        trunc4((col("best.q") - col("mi.q")).cast(dd) / lit(1e12))
          .as("quality_gain"))
      .orderBy("cluster_id")
  }

  private val oDedupBestOfCluster = {
    val oPairs = QText.oracles("dedup_lsh_pairs")
    s"""WITH RECURSIVE pairs AS (SELECT a_id, b_id FROM ($oPairs)),
       |e AS (SELECT a_id AS src, b_id AS dst FROM pairs
       |  UNION ALL SELECT b_id, a_id FROM pairs),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM e
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
       |comp AS (SELECT src AS doc_id, least(min(dst), src) AS cluster_id
       |  FROM reach GROUP BY src),
       |score AS (SELECT doc_id,
       |    (len(list_distinct(string_split(text, ' '))) * 1000000000000)
       |      // len(string_split(text, ' ')) AS q
       |  FROM documents),
       |members AS (SELECT c.cluster_id, c.doc_id, s.q
       |  FROM comp c JOIN score s ON s.doc_id = c.doc_id),
       |ag AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
       |    max(struct_pack(q := q, nid := -doc_id)) AS best,
       |    CAST(min(doc_id) AS BIGINT) AS minid_doc,
       |    min(struct_pack(doc_id := doc_id, q := q)) AS mi
       |  FROM members GROUP BY 1)
       |SELECT cluster_id, n_members,
       |  CAST(-(best.nid) AS BIGINT) AS kept_doc, minid_doc,
       |  CASE WHEN -(best.nid) <> minid_doc THEN 1 ELSE 0 END
       |    AS policy_differs,
       |  ${oTrunc4("CAST(best.q - mi.q AS DOUBLE) / 1e12")} AS quality_gain
       |FROM ag WHERE n_members >= 2 ORDER BY cluster_id""".stripMargin
  }

  // ---- ts_changepoint_binseg ----

  /** Binary segmentation: for each candidate split t of the per-type
    * daily series, the variance-reduction gain
    * S_L²/n_L + S_R²/n_R − S²/n from exact prefix sums; the best break
    * is the argmax (gain desc, earliest day). The doubles divide
    * identical exact integers, so the argmax is engine-stable.
    *
    * Scale shape: prefix sums are per-type running windows; the argmax
    * is one ranking over the bounded candidate set. */
  private[graft] def changepointBinseg(events: DataFrame): DataFrame = {
    val dd = DoubleType
    val wT = Window.partitionBy("event_type")
    val wRun = wT.orderBy("dt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val daily = events
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast(DateType).as("dt"))
      .agg(count(lit(1)).as("c"))
      .withColumn("n", count(lit(1)).over(wT))
      .withColumn("s", sum("c").over(wT))
      .withColumn("i", row_number().over(wT.orderBy("dt")).cast(LongType))
      .withColumn("ps", sum("c").over(wRun))
    val cands = daily.filter(col("i") < col("n"))
      .withColumn("gain",
        col("ps").cast(dd) * col("ps").cast(dd) / col("i").cast(dd) +
        (col("s") - col("ps")).cast(dd) * (col("s") - col("ps")).cast(dd) /
          (col("n") - col("i")).cast(dd) -
        col("s").cast(dd) * col("s").cast(dd) / col("n").cast(dd))
    val wPick = Window.partitionBy("event_type")
      .orderBy(col("gain").desc, col("i"))
    cands.withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("n").as("n_days"),
        col("i").as("split_after"),
        col("dt").cast(StringType).as("split_date"),
        trunc4(col("gain")).as("gain"),
        trunc4(col("ps").cast(dd) / col("i").cast(dd)).as("mean_left"),
        trunc4((col("s") - col("ps")).cast(dd) /
          (col("n") - col("i")).cast(dd)).as("mean_right"))
      .orderBy("event_type")
  }

  private def tsChangepointBinseg(s: SparkSession, d: String): DataFrame =
    changepointBinseg(t(s, d, "events"))

  private val oTsChangepointBinseg =
    s"""WITH daily AS (SELECT event_type,
       |    CAST(date_trunc('day', ts) AS DATE) AS dt,
       |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
       |t1 AS (SELECT *, CAST(count(*) OVER w AS BIGINT) AS n,
       |    CAST(sum(c) OVER w AS BIGINT) AS s,
       |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY dt)
       |      AS BIGINT) AS i,
       |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY dt
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS BIGINT) AS ps
       |  FROM daily WINDOW w AS (PARTITION BY event_type)),
       |cands AS (SELECT *,
       |    CAST(ps AS DOUBLE) * ps / i
       |      + CAST(s - ps AS DOUBLE) * (s - ps) / (n - i)
       |      - CAST(s AS DOUBLE) * s / n AS gain
       |  FROM t1 WHERE i < n),
       |p AS (SELECT *, row_number() OVER (PARTITION BY event_type
       |    ORDER BY gain DESC, i) AS rn FROM cands)
       |SELECT event_type, n AS n_days, i AS split_after,
       |  CAST(dt AS VARCHAR) AS split_date, ${oTrunc4("gain")} AS gain,
       |  ${oTrunc4("CAST(ps AS DOUBLE) / i")} AS mean_left,
       |  ${oTrunc4("CAST(s - ps AS DOUBLE) / (n - i)")} AS mean_right
       |FROM p WHERE rn = 1 ORDER BY event_type""".stripMargin

  // ---- fn_interval_arith ----

  /** Calendar arithmetic parity over a bounded order sample: quarter,
    * ISO week, normalized day-of-week, add_months(+3), last_day of
    * month, and the make_date round-trip — each spelled with its exact
    * cross-engine twin (Spark dayofweek is 1=Sunday; the oracle maps
    * DuckDB's 0=Sunday onto it explicitly).
    *
    * Scale shape: pure projection over a key-pruned sample. */
  private[graft] def intervalArith(orders: DataFrame): DataFrame =
    orders.filter(col("o_orderkey") < 400)
      .select(col("o_orderkey"),
        quarter(col("o_orderdate")).as("q"),
        weekofyear(col("o_orderdate")).as("iso_week"),
        dayofweek(col("o_orderdate")).as("dow1"),
        add_months(col("o_orderdate").cast(DateType), 3)
          .cast(StringType).as("plus3m"),
        last_day(col("o_orderdate").cast(DateType))
          .cast(StringType).as("month_end"),
        make_date(year(col("o_orderdate")), month(col("o_orderdate")),
          dayofmonth(col("o_orderdate"))).cast(StringType).as("remade"))
      .orderBy("o_orderkey")

  private def fnIntervalArith(s: SparkSession, d: String): DataFrame =
    intervalArith(t(s, d, "orders"))

  private val oFnIntervalArith =
    """SELECT o_orderkey,
      |  CAST(quarter(o_orderdate) AS INT) AS q,
      |  CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
      |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow1,
      |  CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR)
      |    AS plus3m,
      |  CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
      |  CAST(make_date(CAST(year(o_orderdate) AS INT),
      |    CAST(month(o_orderdate) AS INT),
      |    CAST(day(o_orderdate) AS INT)) AS VARCHAR) AS remade
      |FROM orders WHERE o_orderkey < 400 ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, QFn] = Map(
    "dedup_best_of_cluster" -> ((s, d) => bestOfCluster(s, d)),
    "ts_changepoint_binseg" -> tsChangepointBinseg _,
    "fn_interval_arith"     -> fnIntervalArith _)

  val oracles: Map[String, String] = Map(
    "dedup_best_of_cluster" -> oDedupBestOfCluster,
    "ts_changepoint_binseg" -> oTsChangepointBinseg,
    "fn_interval_arith"     -> oFnIntervalArith)
}
