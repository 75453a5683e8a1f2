package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 79 (SURVEY §2.28):
  *
  *  - `chp_bandit_ucb_replay`: deterministic offline UCB1 policy replay
  *    over the daily channel series — which channel would a bandit have
  *    picked, and what regret did it pay vs the best fixed arm.
  *  - `profile_join_fanout`: join fan-out profiler over the star
  *    schema's FK edges — the cardinality diagnostics a planner (or an
  *    engineer) reads before running the big join.
  *  - `agg_hodges_lehmann`: the Hodges–Lehmann pseudo-median (median of
  *    pairwise Walsh averages) per series — the rank-based robust
  *    location estimate.
  */
object QRound9cb extends QueryPack {

  private val dd = DoubleType

  // ---- chp_bandit_ucb_replay ----

  /** The exact UCB1 replay shared by the engine UDF and (re-spelled
    * verbatim) the oracle recursion: arms play once each in fixed
    * order, then argmax of mean + sqrt(2·ln t/n) with lowest-index
    * tie-break; rewards are the arms' daily counts. Returns
    * (pulls(4), sums(4), collected, bestArm). */
  private[graft] def ucbReplay(r: Seq[Seq[Long]]): (Array[Long], Array[Long]) = {
    val tSteps = r.length
    val n = new Array[Long](4)
    val s = new Array[Long](4)
    var t = 0
    while (t < tSteps) {
      val pick =
        if (t < 4) t
        else {
          val u = new Array[Double](4)
          var a = 0
          while (a < 4) {
            u(a) = s(a).toDouble / n(a).toDouble +
              math.sqrt(2.0 * math.log((t + 1).toDouble) / n(a).toDouble)
            a += 1
          }
          if (u(0) >= u(1) && u(0) >= u(2) && u(0) >= u(3)) 0
          else if (u(1) >= u(2) && u(1) >= u(3)) 1
          else if (u(2) >= u(3)) 2
          else 3
        }
      n(pick) += 1
      s(pick) += r(t)(pick)
      t += 1
    }
    (n, s)
  }

  /** Offline UCB1 replay: the four non-purchase channels are arms,
    * their daily counts the rewards; the policy is replayed over the
    * day-ordered reward matrix (bounded model state), and every arm
    * reports its pulls, collected reward, and the shared regret vs the
    * best fixed arm in hindsight. The sequential recursion is run
    * in-engine as a UDF over the collected matrix and in the oracle as
    * a WITH RECURSIVE carrying the 8-number state — identical double
    * ops in identical order.
    *
    * Scale shape: the daily rollup is the shuffle; the replay is
    * days-long model state. */
  private[graft] def banditUcbReplay(s: SparkSession, d: String): DataFrame = {
    val daily = QRound9b.evDaily(s, d)
      .filter(col("event_type") =!= "purchase")
    val days = daily.groupBy("day_num").pivot("event_type",
        Seq("click", "error", "signup", "view"))
      .agg(first("cnt"))
      .na.fill(0L)
    val mat = days.agg(expr(
      "transform(array_sort(collect_list(struct(day_num, click, error, signup, view))), z -> array(z.click, z.error, z.signup, z.view))")
      .as("m"))
    val repU = udf((m: Seq[Seq[Long]]) => {
      val (n, sm) = ucbReplay(m)
      val best = (0 until 4).map(a => m.map(_(a)).sum).max
      val collected = sm.sum
      (0 until 4).map(a => (a, n(a), sm(a), best - collected))
    })
    val arms = Seq("click", "error", "signup", "view")
    val armDf = s.createDataFrame(arms.zipWithIndex.map(t => (t._2, t._1)))
      .toDF("arm_idx", "arm")
    mat.select(explode(repU(col("m"))).as("r"))
      .select(col("r._1").as("arm_idx"), col("r._2").as("n_pulls"),
        col("r._3").as("reward"), col("r._4").as("regret"))
      .join(broadcast(armDf), "arm_idx")
      .select(col("arm"), col("n_pulls"), col("reward"), col("regret"))
      .orderBy("arm")
  }

  private val oChpBanditUcb =
    """WITH RECURSIVE daily AS (SELECT event_type,
      |    epoch_us(date_trunc('day', ts)) // 86400000000 AS day_num,
      |    count(*) AS cnt FROM events GROUP BY 1, 2),
      |days AS MATERIALIZED (SELECT day_num,
      |    coalesce(max(CASE WHEN event_type = 'click' THEN cnt END), 0)
      |      AS r0,
      |    coalesce(max(CASE WHEN event_type = 'error' THEN cnt END), 0)
      |      AS r1,
      |    coalesce(max(CASE WHEN event_type = 'signup' THEN cnt END), 0)
      |      AS r2,
      |    coalesce(max(CASE WHEN event_type = 'view' THEN cnt END), 0)
      |      AS r3
      |  FROM daily WHERE event_type <> 'purchase' GROUP BY 1),
      |idx AS MATERIALIZED (SELECT row_number() OVER (ORDER BY day_num)
      |    AS i, r0, r1, r2, r3 FROM days),
      |tn AS (SELECT count(*) AS tsteps FROM idx),
      |st(i, n0, n1, n2, n3, s0, s1, s2, s3) AS (
      |  SELECT 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
      |    CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
      |    CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      |  UNION ALL
      |  SELECT st.i + 1,
      |    st.n0 + CASE WHEN pick = 0 THEN 1 ELSE 0 END,
      |    st.n1 + CASE WHEN pick = 1 THEN 1 ELSE 0 END,
      |    st.n2 + CASE WHEN pick = 2 THEN 1 ELSE 0 END,
      |    st.n3 + CASE WHEN pick = 3 THEN 1 ELSE 0 END,
      |    st.s0 + CASE WHEN pick = 0 THEN st.r0 ELSE 0 END,
      |    st.s1 + CASE WHEN pick = 1 THEN st.r1 ELSE 0 END,
      |    st.s2 + CASE WHEN pick = 2 THEN st.r2 ELSE 0 END,
      |    st.s3 + CASE WHEN pick = 3 THEN st.r3 ELSE 0 END
      |  FROM (
      |    SELECT st.*, y.r0, y.r1, y.r2, y.r3,
      |      CASE WHEN st.i < 4 THEN st.i ELSE (
      |        CASE WHEN u0 >= u1 AND u0 >= u2 AND u0 >= u3 THEN 0
      |             WHEN u1 >= u2 AND u1 >= u3 THEN 1
      |             WHEN u2 >= u3 THEN 2 ELSE 3 END) END AS pick
      |    FROM (
      |      SELECT st.*,
      |        CAST(st.s0 AS DOUBLE)/CAST(st.n0 AS DOUBLE)
      |          + sqrt(2e0*ln(CAST(st.i + 1 AS DOUBLE))
      |            /CAST(st.n0 AS DOUBLE)) AS u0,
      |        CAST(st.s1 AS DOUBLE)/CAST(st.n1 AS DOUBLE)
      |          + sqrt(2e0*ln(CAST(st.i + 1 AS DOUBLE))
      |            /CAST(st.n1 AS DOUBLE)) AS u1,
      |        CAST(st.s2 AS DOUBLE)/CAST(st.n2 AS DOUBLE)
      |          + sqrt(2e0*ln(CAST(st.i + 1 AS DOUBLE))
      |            /CAST(st.n2 AS DOUBLE)) AS u2,
      |        CAST(st.s3 AS DOUBLE)/CAST(st.n3 AS DOUBLE)
      |          + sqrt(2e0*ln(CAST(st.i + 1 AS DOUBLE))
      |            /CAST(st.n3 AS DOUBLE)) AS u3
      |      FROM st) st
      |    JOIN idx y ON y.i = st.i + 1) st
      |  WHERE st.i < (SELECT tsteps FROM tn)
      |),
      |fin AS (SELECT * FROM st WHERE i = (SELECT tsteps FROM tn)),
      |best AS (SELECT greatest(sum(r0), sum(r1), sum(r2), sum(r3))
      |    AS b FROM idx),
      |coll AS (SELECT s0 + s1 + s2 + s3 AS c FROM fin)
      |SELECT arm, n_pulls, reward,
      |  CAST((SELECT b FROM best) - (SELECT c FROM coll) AS BIGINT)
      |    AS regret
      |FROM (
      |  SELECT 'click' AS arm, CAST(n0 AS BIGINT) AS n_pulls,
      |    CAST(s0 AS BIGINT) AS reward FROM fin
      |  UNION ALL SELECT 'error', n1, s1 FROM fin
      |  UNION ALL SELECT 'signup', n2, s2 FROM fin
      |  UNION ALL SELECT 'view', n3, s3 FROM fin)
      |ORDER BY arm""".stripMargin

  // ---- profile_join_fanout ----

  /** Join fan-out profiler over the schema's FK edges: for each
    * dimension→fact join, the exact per-key match distribution (avg,
    * max, skew ratio) and the implied join output size — the numbers a
    * planner's cardinality estimator guesses and an engineer checks.
    *
    * Scale shape: one groupBy per fact FK + tiny dimension counts;
    * all exact integers, one trunc'd division per edge. */
  private[graft] def joinFanout(s: SparkSession, d: String): DataFrame = {
    def edge(name: String, fact: DataFrame, key: String,
        dimCount: Long): DataFrame = {
      val per = fact.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
      per.agg(count(lit(1)).as("n_keys"), sum("c").as("n_rows"),
          max("c").as("max_per_key"))
        .select(lit(name).as("edge"), lit(dimCount).as("n_dim_rows"),
          col("n_keys"), col("n_rows"), col("max_per_key"),
          trunc4(col("n_rows").cast(dd) / col("n_keys").cast(dd))
            .as("avg_fanout"),
          trunc4(col("max_per_key").cast(dd)
            / (col("n_rows").cast(dd) / col("n_keys").cast(dd)))
            .as("skew_ratio"))
    }
    val li = t(s, d, "lineitem"); val o = t(s, d, "orders")
    val cCnt = t(s, d, "customer").count()
    val pCnt = t(s, d, "part").count()
    val sCnt = t(s, d, "supplier").count()
    val oCnt = o.count()
    edge("customer->orders", o, "o_custkey", cCnt)
      .unionByName(edge("orders->lineitem", li, "l_orderkey", oCnt))
      .unionByName(edge("part->lineitem", li, "l_partkey", pCnt))
      .unionByName(edge("supplier->lineitem", li, "l_suppkey", sCnt))
      .orderBy("edge")
  }

  private val oProfileJoinFanout = {
    def e(name: String, tbl: String, key: String, dim: String) =
      s"""SELECT '$name' AS edge,
         |  (SELECT count(*) FROM $dim) AS n_dim_rows,
         |  count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
         |  CAST(max(c) AS BIGINT) AS max_per_key,
         |  ${oTrunc4("CAST(sum(c) AS DOUBLE)/count(*)")} AS avg_fanout,
         |  ${oTrunc4("CAST(max(c) AS DOUBLE)/(CAST(sum(c) AS DOUBLE)/count(*))")}
         |    AS skew_ratio
         |FROM (SELECT $key, count(*) AS c FROM $tbl GROUP BY 1)""".stripMargin
    s"""SELECT * FROM (
       |${e("customer->orders", "orders", "o_custkey", "customer")}
       |UNION ALL
       |${e("orders->lineitem", "lineitem", "l_orderkey", "orders")}
       |UNION ALL
       |${e("part->lineitem", "lineitem", "l_partkey", "part")}
       |UNION ALL
       |${e("supplier->lineitem", "lineitem", "l_suppkey", "supplier")}
       |) ORDER BY edge""".stripMargin
  }

  // ---- agg_hodges_lehmann ----

  /** Hodges–Lehmann pseudo-median per event-type daily series: the
    * median of all pairwise Walsh averages (x_i + x_j)/2 over i ≤ j —
    * integer sums halved exactly, identical multiset ⇒ identical
    * median in both engines; reported beside the plain median for the
    * robustness gap.
    *
    * Scale shape: the i ≤ j pair join is days², bounded by series
    * length. */
  private[graft] def hodgesLehmann(s: SparkSession, d: String): DataFrame = {
    val daily = QRound9b.evDaily(s, d)
    val a = daily.select(col("event_type"), col("cnt").as("xi"),
      col("day_num").as("di"))
    val b = daily.select(col("event_type"), col("cnt").as("xj"),
      col("day_num").as("dj"))
    val walsh = a.join(b, "event_type").filter(col("di") <= col("dj"))
      .select(col("event_type"),
        ((col("xi") + col("xj")).cast(dd) / lit(2.0)).as("w"))
    val med = daily.groupBy("event_type")
      .agg(expr("median(CAST(cnt AS DOUBLE))").as("plain_median"),
        count(lit(1)).as("n_days"))
    walsh.groupBy("event_type")
      .agg(count(lit(1)).as("n_pairs"), expr("median(w)").as("hl"))
      .join(med, "event_type")
      .select(col("event_type"), col("n_days"), col("n_pairs"),
        trunc4(col("hl")).as("hodges_lehmann"),
        trunc4(col("plain_median")).as("plain_median"))
      .orderBy("event_type")
  }

  private val oAggHodgesLehmann =
    s"""WITH daily AS (SELECT event_type,
       |    epoch_us(date_trunc('day', ts)) // 86400000000 AS day_num,
       |    count(*) AS cnt FROM events GROUP BY 1, 2),
       |walsh AS (SELECT a.event_type,
       |    CAST(a.cnt + b.cnt AS DOUBLE)/2e0 AS w
       |  FROM daily a JOIN daily b ON a.event_type = b.event_type
       |    AND a.day_num <= b.day_num),
       |med AS (SELECT event_type, median(CAST(cnt AS DOUBLE))
       |    AS plain_median, count(*) AS n_days FROM daily GROUP BY 1),
       |hl AS (SELECT event_type, count(*) AS n_pairs, median(w) AS hl
       |  FROM walsh GROUP BY 1)
       |SELECT hl.event_type, CAST(n_days AS BIGINT) AS n_days,
       |  CAST(n_pairs AS BIGINT) AS n_pairs,
       |  ${oTrunc4("hl")} AS hodges_lehmann,
       |  ${oTrunc4("plain_median")} AS plain_median
       |FROM hl JOIN med USING (event_type) ORDER BY event_type""".stripMargin

  val queries: Map[String, QFn] = Map(
    "chp_bandit_ucb_replay" -> ((s, d) => banditUcbReplay(s, d)),
    "profile_join_fanout"   -> ((s, d) => joinFanout(s, d)),
    "agg_hodges_lehmann"    -> ((s, d) => hodgesLehmann(s, d)))

  val oracles: Map[String, String] = Map(
    "chp_bandit_ucb_replay" -> oChpBanditUcb,
    "profile_join_fanout"   -> oProfileJoinFanout,
    "agg_hodges_lehmann"    -> oAggHodgesLehmann)
}
