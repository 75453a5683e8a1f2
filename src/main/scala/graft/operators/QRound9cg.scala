package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 84 (SURVEY §2.28):
  *
  *  - `chp_auc_exact`: EXACT ROC-AUC of the event value scoring
  *    purchase, via the rank-sum (Mann–Whitney) identity with exact
  *    tie-averaged ranks — the oracle-checked twin of the spec-gated
  *    `chp_train_auc`.
  *  - `chp_decision_curve`: decision-curve analysis — net benefit of
  *    acting on the score at each threshold vs treat-all/treat-none;
  *    the model-usefulness plot behind clinical ML.
  *  - `ts_ljung_box`: the Ljung–Box portmanteau test (lags 1..10) per
  *    series — "is there ANY autocorrelation left".
  */
object QRound9cg extends QueryPack {

  private val dd = DoubleType

  // ---- chp_auc_exact ----

  /** Exact AUC by the rank-sum identity: average ranks over ties kept
    * as EXACT ×2 integers (2·avgrank = 2·lo + (cnt−1) for a tie
    * group), U = Σ2r⁺/2 − n⁺(n⁺+1)/2, AUC = U/(n⁺·n⁻) — one double
    * division at the end. Ties contribute exactly ½ by construction.
    *
    * Scale shape: one value rollup + one ordering window over DISTINCT
    * values (not rows), then a label join. */
  private[graft] def aucExact(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events").select(col("value"),
      (col("event_type") === "purchase").cast(LongType).as("y"))
    val grp = ev.groupBy("value").agg(count(lit(1)).as("cnt"),
      sum("y").as("pos"))
      .withColumn("bkt", floor(col("value")).cast(LongType))
    // two-level prefix sum — no global window (the PlanSpec gate):
    // the bucket histogram is value-range-bounded model state (the
    // collected-scalar discipline); within-bucket prefixes partition
    // cleanly
    val bTot = grp.groupBy("bkt").agg(sum("cnt").as("bc"))
      .collect().map(r => (r.getAs[Long]("bkt"), r.getAs[Long]("bc")))
      .sortBy(_._1)
    var run = 0L
    val prefix = bTot.map { case (b, c) =>
      val below = run; run += c; (b, below) }
    import s.implicits._
    val prefixDf = prefix.toSeq.toDF("bkt", "bkt_below")
    val wIn = Window.partitionBy("bkt").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = grp.join(broadcast(prefixDf), "bkt")
      .withColumn("below", col("bkt_below")
        + coalesce(sum("cnt").over(wIn), lit(0L)))
      // 2*avg rank of this tie group = 2*(below+1) + (cnt-1)
      .withColumn("r2", lit(2L) * (col("below") + 1) + (col("cnt") - 1))
    val agg = ranked.agg(
      sum(col("pos") * col("r2")).as("sum2r_pos"),
      sum("pos").as("npos"), sum("cnt").as("n"))
    agg.select(col("n"), col("npos"),
        (col("n") - col("npos")).as("nneg"),
        trunc6(expr(
          "(CAST(sum2r_pos AS DOUBLE)/2e0 - CAST(npos AS DOUBLE)*(CAST(npos AS DOUBLE) + 1e0)/2e0)" +
            "/(CAST(npos AS DOUBLE)*CAST(n - npos AS DOUBLE))"))
          .as("auc"))
  }

  private val oChpAucExact =
    s"""WITH ev AS (SELECT value,
       |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
       |  FROM events),
       |grp AS (SELECT value, count(*) AS cnt, CAST(sum(y) AS BIGINT)
       |    AS pos FROM ev GROUP BY 1),
       |rk AS (SELECT *, coalesce(CAST(sum(cnt) OVER (ORDER BY value
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
       |    0) AS below FROM grp),
       |r2 AS (SELECT *, 2*(below + 1) + (cnt - 1) AS r2 FROM rk),
       |agg AS (SELECT CAST(sum(pos*r2) AS BIGINT) AS sum2r_pos,
       |    CAST(sum(pos) AS BIGINT) AS npos, CAST(sum(cnt) AS BIGINT)
       |      AS n FROM r2)
       |SELECT n, npos, n - npos AS nneg,
       |  ${oTrunc6("(CAST(sum2r_pos AS DOUBLE)/2e0 - CAST(npos AS DOUBLE)*(CAST(npos AS DOUBLE) + 1e0)/2e0)/(CAST(npos AS DOUBLE)*CAST(n - npos AS DOUBLE))")}
       |    AS auc
       |FROM agg""".stripMargin

  // ---- chp_decision_curve ----

  private val dcThresholds = Seq(5, 10, 15, 20, 25, 30)

  /** Decision-curve analysis: treating "value ≥ cut" as the decision
    * rule for predicting purchase, net benefit at probability
    * threshold t is TP/n − FP/n·t/(1−t); compared against treat-all
    * (prevalence − (1−prevalence)·t/(1−t)) and treat-none (0). The cut
    * for each t is the value whose implied alarm rate matches — here
    * the fixed grid of value cuts stands in, with t = cut/100 (shared
    * literals). Exact TP/FP counts; one shared tower per row.
    *
    * Scale shape: thresholds broadcast as literals; one scan. */
  private[graft] def decisionCurve(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events").select(col("value"),
      (col("event_type") === "purchase").cast(LongType).as("y"))
    val thr = s.createDataFrame(dcThresholds.map(Tuple1(_))).toDF("cut")
    val cells = ev.crossJoin(broadcast(thr))
      .groupBy("cut").agg(count(lit(1)).as("n"), sum("y").as("npos"),
        sum(when(col("value") >= col("cut") * 10, col("y"))
          .otherwise(0L)).as("tp"),
        sum(when(col("value") >= col("cut") * 10, lit(1L) - col("y"))
          .otherwise(0L)).as("fp"))
    cells.withColumn("t", col("cut").cast(dd) / lit(1e2))
      .select(col("cut"), col("tp"), col("fp"),
        trunc6(expr(
          "CAST(tp AS DOUBLE)/n - CAST(fp AS DOUBLE)/n * t/(1e0 - t)"))
          .as("net_benefit"),
        trunc6(expr(
          "CAST(npos AS DOUBLE)/n - CAST(n - npos AS DOUBLE)/n * t/(1e0 - t)"))
          .as("nb_treat_all"))
      .orderBy("cut")
  }

  private val oChpDecisionCurve =
    s"""WITH ev AS (SELECT value,
       |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
       |  FROM events),
       |cells AS (SELECT cut, count(*) AS n, CAST(sum(y) AS BIGINT)
       |      AS npos,
       |    CAST(sum(CASE WHEN value >= cut * 10 THEN y ELSE 0 END)
       |      AS BIGINT) AS tp,
       |    CAST(sum(CASE WHEN value >= cut * 10 THEN 1 - y ELSE 0 END)
       |      AS BIGINT) AS fp
       |  FROM ev, (SELECT unnest([${dcThresholds.mkString(", ")}]) AS cut)
       |  GROUP BY 1),
       |tt AS (SELECT *, CAST(cut AS DOUBLE)/1e2 AS t FROM cells)
       |SELECT CAST(cut AS INT) AS cut, tp, fp,
       |  ${oTrunc6("CAST(tp AS DOUBLE)/n - CAST(fp AS DOUBLE)/n * t/(1e0 - t)")}
       |    AS net_benefit,
       |  ${oTrunc6("CAST(npos AS DOUBLE)/n - CAST(n - npos AS DOUBLE)/n * t/(1e0 - t)")}
       |    AS nb_treat_all
       |FROM tt ORDER BY cut""".stripMargin

  // ---- ts_ljung_box ----

  /** Ljung–Box Q over lags 1..10 per series: exact-integer ACF
    * (n·x − Σx centering), per-lag term n(n+2)·r_k²/(n−k)
    * scale-to-long'd at 1e9 (order-independent sum), verdict vs the
    * χ²(10) 5% critical value 18.307 as a shared literal.
    *
    * Scale shape: ten lead windows + one rollup per type. */
  private[graft] def ljungBox(s: SparkSession, d: String): DataFrame = {
    val daily = QRound9b.evDaily(s, d)
    val st = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cnt").as("stot"))
    val c = daily.join(broadcast(st), "event_type")
      .select(col("event_type"), col("day_num"), col("n"),
        (col("n") * col("cnt") - col("stot")).as("c"))
    val w = Window.partitionBy("event_type").orderBy("day_num")
    val led = (1 to 10).foldLeft(c) { (df, k) =>
      df.withColumn(s"c$k", lead("c", k).over(w))
    }
    val aggs = Seq(sum(col("c") * col("c")).as("den")) ++
      (1 to 10).map(k => sum(col("c") * col(s"c$k")).as(s"num$k"))
    val m = led.groupBy("event_type", "n").agg(aggs.head, aggs.tail: _*)
    val terms = (1 to 10).map { k =>
      s"""CAST(floor(CAST(n AS DOUBLE)*(CAST(n AS DOUBLE) + 2e0)
         |*(CAST(num$k AS DOUBLE)/CAST(den AS DOUBLE))
         |*(CAST(num$k AS DOUBLE)/CAST(den AS DOUBLE))
         |/CAST(n - $k AS DOUBLE)*1e9 + 5e-1) AS BIGINT)""".stripMargin
    }.mkString(" + ")
    m.withColumn("q_sc", expr(terms))
      .select(col("event_type"), col("n").as("n_days"),
        trunc4(col("q_sc").cast(dd) / lit(1e9)).as("ljung_box_q"),
        (trunc4(col("q_sc").cast(dd) / lit(1e9)) > lit(18.307))
          .cast(IntegerType).as("rejects_white_noise"))
      .orderBy("event_type")
  }

  private val oTsLjungBox = {
    val leads = (1 to 10).map(k => s"lead(c, $k) OVER w AS c$k")
      .mkString(", ")
    val nums = (1 to 10).map(k =>
      s"CAST(sum(c*c$k) AS BIGINT) AS num$k").mkString(", ")
    val terms = (1 to 10).map { k =>
      s"""CAST(floor(CAST(n AS DOUBLE)*(CAST(n AS DOUBLE) + 2e0)
         |*(CAST(num$k AS DOUBLE)/CAST(den AS DOUBLE))
         |*(CAST(num$k AS DOUBLE)/CAST(den AS DOUBLE))
         |/CAST(n - $k AS DOUBLE)*1e9 + 5e-1) AS BIGINT)""".stripMargin
    }.mkString(" + ")
    s"""WITH daily AS (SELECT event_type,
       |    epoch_us(date_trunc('day', ts)) // 86400000000 AS day_num,
       |    count(*) AS cnt FROM events GROUP BY 1, 2),
       |st AS (SELECT event_type, count(*) AS n, CAST(sum(cnt) AS BIGINT)
       |    AS stot FROM daily GROUP BY 1),
       |c AS (SELECT d.event_type, day_num, n, (n*cnt - stot) AS c
       |  FROM daily d JOIN st USING (event_type)),
       |led AS (SELECT event_type, n, c, $leads
       |  FROM c WINDOW w AS (PARTITION BY event_type ORDER BY day_num)),
       |m AS (SELECT event_type, n, CAST(sum(c*c) AS BIGINT) AS den, $nums
       |  FROM led GROUP BY 1, 2),
       |q AS (SELECT event_type, n, ($terms) AS q_sc FROM m)
       |SELECT event_type, CAST(n AS BIGINT) AS n_days,
       |  ${oTrunc4("CAST(q_sc AS DOUBLE)/1e9")} AS ljung_box_q,
       |  CAST(${oTrunc4("CAST(q_sc AS DOUBLE)/1e9")} > 18307e-3 AS INT)
       |    AS rejects_white_noise
       |FROM q ORDER BY event_type""".stripMargin
  }

  val queries: Map[String, QFn] = Map(
    "chp_auc_exact"      -> ((s, d) => aucExact(s, d)),
    "chp_decision_curve" -> ((s, d) => decisionCurve(s, d)),
    "ts_ljung_box"       -> ((s, d) => ljungBox(s, d)))

  val oracles: Map[String, String] = Map(
    "chp_auc_exact"      -> oChpAucExact,
    "chp_decision_curve" -> oChpDecisionCurve,
    "ts_ljung_box"       -> oTsLjungBox)
}
