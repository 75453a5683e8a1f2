package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Round-9 extension wave 39 (SURVEY §2.28):
  *
  *  - `sim_eval_mrr_ndcg`: retrieval ranking metrics (MRR@10, NDCG@10,
  *    precision@10) over the exact top-10 with label-match relevance —
  *    the eval harness every retrieval/recsys change ships with.
  *  - `fn_printf_format`: C-style format parity (Spark format_string vs
  *    DuckDB printf) over integer/string/hex directives — the report
  *    formatting surface (float directives excluded: libc and Java
  *    round ties differently).
  *  - `ts_wma_linear`: linearly-weighted moving average over the daily
  *    series (weights 7..1/28) — the lag-compensated smoother between
  *    SMA and EWMA.
  */
object QRound9an extends QueryPack {

  // ---- sim_eval_mrr_ndcg ----

  /** Ranking metrics per probe query: relevance = neighbor label equals
    * the query label (binary), over the exact cosine top-10 (self-hit
    * excluded — it would gift every query a free rank-1 hit). MRR =
    * 1/first-hit rank; NDCG@10 with 1/log2(1+i) discounts against the
    * ideal ordering; P@10. The log2 calls run on small integer
    * arguments — identical doubles in, 1-ulp-safe out (trunc4'd once,
    * the udaf_geomean exposure).
    *
    * Scale shape: composes the memoized exact ranking (bounded probe
    * set); metrics are per-query bounded aggregates; the ideal-DCG
    * denominator derives from the same 10-row group. */
  private[graft] def mrrNdcg(s: SparkSession, d: String): DataFrame = {
    val top = QSim.simCosineTopk(s, d) // (qid, rnk, vec_id, score)
      .filter(col("vec_id") =!= col("qid"))
    val lab = t(s, d, "embeddings").select(col("vec_id"), col("label"))
    val qlab = lab.select(col("vec_id").as("qid"), col("label").as("qlabel"))
    val scored = top
      .join(broadcast(lab), "vec_id")
      .join(broadcast(qlab), "qid")
      .withColumn("rel", (col("label") === col("qlabel")).cast(LongType))
      // re-rank after dropping the self hit so ranks are 1..9 contiguous
      .withColumn("r", row_number().over(
        Window.partitionBy("qid").orderBy("rnk")))
    val dcgTerm = col("rel").cast(DoubleType) /
      log2(col("r").cast(DoubleType) + lit(1.0))
    val idealTerm = lit(1.0) / log2(col("ir").cast(DoubleType) + lit(1.0))
    val perQ = scored.groupBy("qid")
      .agg(count(lit(1)).as("k"),
        sum("rel").as("hits"),
        min(when(col("rel") === 1, col("r"))).as("first_hit"),
        sum(dcgTerm).as("dcg"))
    val ideal = scored.filter(col("rel") === 1)
      .withColumn("ir", row_number().over(
        Window.partitionBy("qid").orderBy("r")))
      .groupBy("qid").agg(sum(idealTerm).as("idcg"))
    perQ.join(ideal, Seq("qid"), "left_outer")
      .select(col("qid"), col("k"), col("hits"),
        trunc4(when(col("first_hit").isNotNull,
          lit(1.0) / col("first_hit").cast(DoubleType)).otherwise(lit(0.0)))
          .as("mrr"),
        trunc4(when(col("idcg").isNotNull, col("dcg") / col("idcg"))
          .otherwise(lit(0.0))).as("ndcg"),
        trunc4(col("hits").cast(DoubleType) / col("k").cast(DoubleType))
          .as("prec_k"))
      .orderBy("qid")
  }

  private val oSimEvalMrrNdcg = {
    val oTop = QSim.oracles("sim_cosine_topk")
    s"""WITH top AS (SELECT qid, rnk, vec_id FROM ($oTop)
       |  WHERE vec_id <> qid),
       |rr AS (SELECT t.qid, t.vec_id,
       |    row_number() OVER (PARTITION BY t.qid ORDER BY t.rnk) AS r,
       |    CASE WHEN e.label = q.label THEN 1 ELSE 0 END AS rel
       |  FROM top t
       |    JOIN embeddings e ON e.vec_id = t.vec_id
       |    JOIN embeddings q ON q.vec_id = t.qid),
       |perq AS (SELECT qid, CAST(count(*) AS BIGINT) AS k,
       |    CAST(sum(rel) AS BIGINT) AS hits,
       |    min(CASE WHEN rel = 1 THEN r END) AS first_hit,
       |    sum(CAST(rel AS DOUBLE) / log2(CAST(r AS DOUBLE) + 1e0)) AS dcg
       |  FROM rr GROUP BY qid),
       |ide AS (SELECT qid,
       |    sum(1e0 / log2(CAST(ir AS DOUBLE) + 1e0)) AS idcg
       |  FROM (SELECT qid, row_number() OVER (PARTITION BY qid
       |      ORDER BY r) AS ir FROM rr WHERE rel = 1)
       |  GROUP BY qid)
       |SELECT p.qid, p.k, p.hits,
       |  ${oTrunc4("CASE WHEN p.first_hit IS NOT NULL THEN 1e0 / p.first_hit ELSE 0e0 END")} AS mrr,
       |  ${oTrunc4("CASE WHEN i.idcg IS NOT NULL THEN p.dcg / i.idcg ELSE 0e0 END")} AS ndcg,
       |  ${oTrunc4("CAST(p.hits AS DOUBLE) / p.k")} AS prec_k
       |FROM perq p LEFT JOIN ide i ON p.qid = i.qid
       |ORDER BY p.qid""".stripMargin
  }

  // ---- fn_printf_format ----

  /** C-style formatting parity: order ids zero-padded, hex keys, padded
    * string labels — Spark's format_string and DuckDB's printf agree on
    * %d/%05d/%x/%s directives (float directives deliberately excluded:
    * Java rounds %.2f HALF_UP, libc rounds to-even — a tie-breaking
    * trap, documented here instead of shipped).
    *
    * Scale shape: pure map-side string codegen; the filter prunes at
    * the scan. */
  private[graft] def printfFormat(orders: DataFrame): DataFrame =
    orders
      .filter(col("o_orderkey") < 100)
      .select(col("o_orderkey"),
        format_string("ORD-%07d", col("o_orderkey")).as("order_tag"),
        format_string("%x", col("o_orderkey")).as("key_hex"),
        format_string("[%-12s]", col("o_orderpriority")).as("prio_cell"),
        format_string("%d/%s", col("o_custkey"), col("o_orderstatus"))
          .as("cust_status"))
      .orderBy("o_orderkey")

  private def fnPrintfFormat(s: SparkSession, d: String): DataFrame =
    printfFormat(t(s, d, "orders"))

  private val oFnPrintfFormat =
    """SELECT o_orderkey,
      |  printf('ORD-%07d', o_orderkey) AS order_tag,
      |  printf('%x', o_orderkey) AS key_hex,
      |  printf('[%-12s]', o_orderpriority) AS prio_cell,
      |  printf('%d/%s', o_custkey, o_orderstatus) AS cust_status
      |FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""".stripMargin

  // ---- ts_wma_linear ----

  private val wmaN = 7

  /** Linearly-weighted 7-day moving average of the daily per-type value
    * series: weights 7,6,…,1 (newest heaviest), denominator 28. The
    * weighted sum is a FIXED 7-term expression tree over exact-decimal
    * daily sums (not a fold), so both engines evaluate the identical
    * IEEE sequence; full windows only.
    *
    * Scale shape: daily rollup partial-aggregates; the lag terms ride
    * one per-series window sort. */
  private[graft] def wmaLinear(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(sum4(col("value")).as("x"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val lags = (0 until wmaN).map(k => lag(col("x"), k).over(w))
    val wsum = lags.zipWithIndex.map { case (c, k) =>
      c * lit((wmaN - k).toDouble)
    }.reduce(_ + _)
    daily
      .withColumn("wma", trunc4(wsum / lit((wmaN * (wmaN + 1) / 2).toDouble)))
      .withColumn("oldest", lags.last)
      .filter(col("oldest").isNotNull)
      .select(col("event_type"), col("day"), col("x"), col("wma"))
      .orderBy("event_type", "day")
  }

  private def tsWmaLinear(s: SparkSession, d: String): DataFrame =
    wmaLinear(t(s, d, "events"))

  private val oTsWmaLinear = {
    // identical 7-term left-fold: ((x0*7 + x1*6) + x2*5) + ...
    val terms = (0 until wmaN).map { k =>
      s"lag(x, $k) OVER w * ${(wmaN - k)}e0"
    }.mkString(" + ")
    s"""WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
       |    ${oSum4("value")} AS x FROM events GROUP BY 1, 2),
       |l AS (SELECT event_type, day, x,
       |    $terms AS wsum,
       |    lag(x, ${wmaN - 1}) OVER w AS oldest
       |  FROM daily
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day))
       |SELECT event_type, day, x,
       |  ${oTrunc4(s"wsum / ${wmaN * (wmaN + 1) / 2}e0")} AS wma
       |FROM l WHERE oldest IS NOT NULL
       |ORDER BY event_type, day""".stripMargin
  }

  val queries: Map[String, QFn] = Map(
    "sim_eval_mrr_ndcg" -> mrrNdcg _,
    "fn_printf_format"  -> fnPrintfFormat _,
    "ts_wma_linear"     -> tsWmaLinear _)

  val oracles: Map[String, String] = Map(
    "sim_eval_mrr_ndcg" -> oSimEvalMrrNdcg,
    "fn_printf_format"  -> oFnPrintfFormat,
    "ts_wma_linear"     -> oTsWmaLinear)
}
