package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 86 (SURVEY §2.28):
  *
  *  - `agg_spearman_rank`: Spearman rank correlation between each
  *    event type's daily count and daily value series — the robust
  *    "do busier days earn more" monotone-association readout.
  *  - `ts_sample_entropy`: sample entropy (SampEn, m=2) of the daily
  *    count series per type — the regularity/complexity score used on
  *    physiological and ops time series alike.
  *  - `graph_scc_hubs`: strongly connected components of the hub
  *    subgraph of the directed part-sequence graph — do the busiest
  *    parts form feedback cycles or a DAG.
  */
object QRound9ci extends QueryPack {

  private val dd = DoubleType

  // ---- agg_spearman_rank ----

  /** Spearman rho per event type between the daily (count, value-cents)
    * series. Tie-averaged ranks are kept EXACT as doubled integers
    * (2·avg_rank = 2·min_rank + ties − 1 — always a whole number), the
    * five moment sums are exact BIGINTs, and rho is one double division
    * at the end (Pearson on ranks — scale-invariant, so the ×2 cancels).
    * Both engines therefore divide identical integers.
    *
    * Scale shape: one daily rollup (the only events-sized shuffle),
    * then rank windows over the bounded per-type day spine and one
    * five-sum rollup per type. */
  private[graft] def spearmanRank(events: DataFrame): DataFrame = {
    val daily = events.groupBy(col("event_type"),
        expr("unix_micros(cast(date_trunc('DAY', ts) as timestamp)) div 86400000000")
          .as("day_num"))
      .agg(count(lit(1)).as("cnt"),
        expr("sum(CAST(floor(value*100 + 5e-1) AS BIGINT))").as("v_cents"))
    val wx  = Window.partitionBy("event_type").orderBy("cnt")
    val wxe = Window.partitionBy("event_type", "cnt")
    val wy  = Window.partitionBy("event_type").orderBy("v_cents")
    val wye = Window.partitionBy("event_type", "v_cents")
    val ranked = daily
      .withColumn("rx", (lit(2) * rank().over(wx)
        + count(lit(1)).over(wxe) - 1).cast(LongType))
      .withColumn("ry", (lit(2) * rank().over(wy)
        + count(lit(1)).over(wye) - 1).cast(LongType))
    ranked.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(col("rx") * col("ry")).as("sxy"),
        sum("rx").as("sx"), sum("ry").as("sy"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"))
      .select(col("event_type"), col("n_days"),
        trunc4((col("n_days") * col("sxy") - col("sx") * col("sy")).cast(dd) /
          sqrt((col("n_days") * col("sxx") - col("sx") * col("sx")).cast(dd) *
               (col("n_days") * col("syy") - col("sy") * col("sy")).cast(dd)))
          .as("rho"))
      .orderBy("event_type")
  }

  private def aggSpearmanRank(s: SparkSession, d: String): DataFrame =
    spearmanRank(t(s, d, "events"))

  private val oAggSpearmanRank =
    s"""WITH daily AS (SELECT event_type,
       |    epoch_us(date_trunc('day', ts)) // 86400000000 AS day_num,
       |    count(*) AS cnt,
       |    CAST(sum(CAST(floor(value*100 + 5e-1) AS BIGINT)) AS BIGINT)
       |      AS v_cents
       |  FROM events GROUP BY 1, 2),
       |rk AS (SELECT event_type,
       |    CAST(2*rank() OVER (PARTITION BY event_type ORDER BY cnt)
       |      + count(*) OVER (PARTITION BY event_type, cnt) - 1 AS BIGINT)
       |      AS rx,
       |    CAST(2*rank() OVER (PARTITION BY event_type ORDER BY v_cents)
       |      + count(*) OVER (PARTITION BY event_type, v_cents) - 1
       |      AS BIGINT) AS ry
       |  FROM daily),
       |mo AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
       |    CAST(sum(rx*ry) AS BIGINT) AS sxy, CAST(sum(rx) AS BIGINT) AS sx,
       |    CAST(sum(ry) AS BIGINT) AS sy, CAST(sum(rx*rx) AS BIGINT) AS sxx,
       |    CAST(sum(ry*ry) AS BIGINT) AS syy
       |  FROM rk GROUP BY 1)
       |SELECT event_type, n_days,
       |  ${oTrunc4("CAST(n_days*sxy - sx*sy AS DOUBLE) / " +
         "sqrt(CAST(n_days*sxx - sx*sx AS DOUBLE) * " +
         "CAST(n_days*syy - sy*sy AS DOUBLE))")} AS rho
       |FROM mo ORDER BY event_type""".stripMargin

  // ---- ts_sample_entropy ----

  /** SampEn(m=2) of the per-type daily count series with integer
    * Chebyshev tolerance r = (max−min) div 5. Templates are the
    * n−2 fully-defined triples (x_i, x_{i+1}, x_{i+2}); over unordered
    * template pairs i<j, B counts 2-prefix matches (both coordinate
    * gaps ≤ r) and A the 3-matches — so A ⊆ B and SampEn = ln(B/A) ≥ 0
    * exactly. All counts exact integers; one ln at the end (NULL when
    * A = 0 — no 3-template ever repeats).
    *
    * Scale shape: the daily rollup is the shuffle; the pair join is
    * days²-bounded per type (a month of days — model-state sized). */
  private[graft] def sampleEntropy(events: DataFrame): DataFrame = {
    val wd = Window.partitionBy("event_type").orderBy("day_num")
    val daily = events.groupBy(col("event_type"),
        expr("unix_micros(cast(date_trunc('DAY', ts) as timestamp)) div 86400000000")
          .as("day_num"))
      .agg(count(lit(1)).as("cnt"))
    val ser = daily
      .withColumn("i", row_number().over(wd))
      .withColumn("x1", lead("cnt", 1).over(wd))
      .withColumn("x2", lead("cnt", 2).over(wd))
      .filter(col("x1").isNotNull && col("x2").isNotNull)
    val rtab = daily.groupBy("event_type")
      .agg(expr("(max(cnt) - min(cnt)) div 5").as("r_tol"))
    val tm = ser.join(broadcast(rtab), "event_type")
    val p = tm.select(col("event_type"), col("i"), col("cnt"),
      col("x1"), col("x2"), col("r_tol"))
    val q = p.toDF("event_type", "j", "qc", "q1", "q2", "r2")
    val pairs = p.join(q,
      p("event_type") === q("event_type") && col("i") < col("j") &&
        abs(col("cnt") - col("qc")) <= col("r_tol") &&
        abs(col("x1") - col("q1")) <= col("r_tol"))
      .select(p("event_type").as("et"),
        (abs(col("x2") - col("q2")) <= col("r_tol")).cast(LongType)
          .as("m3"))
    val counts = pairs.groupBy("et")
      .agg(count(lit(1)).as("b_cnt"), sum("m3").as("a_cnt"))
    val base = tm.groupBy("event_type")
      .agg(count(lit(1)).as("n_tmpl"), first("r_tol").as("r_tol"))
    base.join(counts, base("event_type") === counts("et"), "left")
      .select(base("event_type"), col("n_tmpl"), col("r_tol"),
        coalesce(col("b_cnt"), lit(0L)).as("b_cnt"),
        coalesce(col("a_cnt"), lit(0L)).as("a_cnt"),
        when(coalesce(col("a_cnt"), lit(0L)) > 0,
          trunc4(log(coalesce(col("b_cnt"), lit(0L)).cast(dd) /
            col("a_cnt").cast(dd)))).as("sampen"))
      .orderBy("event_type")
  }

  private def tsSampleEntropy(s: SparkSession, d: String): DataFrame =
    sampleEntropy(t(s, d, "events"))

  private val oTsSampleEntropy =
    s"""WITH daily AS (SELECT event_type,
       |    epoch_us(date_trunc('day', ts)) // 86400000000 AS day_num,
       |    count(*) AS cnt FROM events GROUP BY 1, 2),
       |rt AS (SELECT event_type, (max(cnt) - min(cnt)) // 5 AS r_tol
       |  FROM daily GROUP BY 1),
       |ser AS (SELECT d.event_type,
       |    row_number() OVER (PARTITION BY d.event_type ORDER BY day_num)
       |      AS i,
       |    cnt,
       |    lead(cnt, 1) OVER (PARTITION BY d.event_type ORDER BY day_num)
       |      AS x1,
       |    lead(cnt, 2) OVER (PARTITION BY d.event_type ORDER BY day_num)
       |      AS x2,
       |    rt.r_tol
       |  FROM daily d JOIN rt ON rt.event_type = d.event_type),
       |tm AS MATERIALIZED (SELECT * FROM ser
       |  WHERE x1 IS NOT NULL AND x2 IS NOT NULL),
       |pr AS (SELECT p.event_type AS et, CAST(count(*) AS BIGINT) AS b_cnt,
       |    CAST(sum(CASE WHEN abs(p.x2 - q.x2) <= p.r_tol THEN 1 ELSE 0
       |      END) AS BIGINT) AS a_cnt
       |  FROM tm p JOIN tm q ON q.event_type = p.event_type
       |    AND p.i < q.i AND abs(p.cnt - q.cnt) <= p.r_tol
       |    AND abs(p.x1 - q.x1) <= p.r_tol
       |  GROUP BY 1),
       |base AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_tmpl,
       |    CAST(any_value(r_tol) AS BIGINT) AS r_tol
       |  FROM tm GROUP BY 1)
       |SELECT b.event_type, b.n_tmpl, b.r_tol,
       |  coalesce(pr.b_cnt, 0) AS b_cnt, coalesce(pr.a_cnt, 0) AS a_cnt,
       |  CASE WHEN coalesce(pr.a_cnt, 0) > 0 THEN
       |    ${oTrunc4("ln(CAST(pr.b_cnt AS DOUBLE)/CAST(pr.a_cnt AS DOUBLE))")}
       |  END AS sampen
       |FROM base b LEFT JOIN pr ON pr.et = b.event_type
       |ORDER BY b.event_type""".stripMargin

  // ---- graph_scc_hubs ----

  private val sccHubCount = 16

  /** Strongly connected components of the 16-hub subgraph of the
    * directed part-sequence graph (edge a→b when part b directly
    * follows a within an order — the `graph_reciprocity` edge set; hubs
    * = top out-degree, (degree desc, partkey) tie-break). Reachability
    * closure by 4 path-doubling rounds (paths ≤ 16 > the 15-hop
    * diameter bound on 16 nodes, so the closure is exact); SCC id of v
    * = min mutually-reachable node. Emits each component's id, member
    * count, and max member.
    *
    * Scale shape: the edge build + degree rollup are the distributed
    * part; the hub subgraph is bounded MODEL STATE (≤16 nodes / ≤256
    * pairs), so the closure and SCC grouping run driver-side on the
    * collected pair set (r11 — the `graph_hits_scores` /
    * `chp_absorbing_prob` V²-bounded-collect discipline; the previous
    * spelling ran 5 checkpointed doubling jobs over ≤256 rows and paid
    * the local job floor on each: 3.6 → ~1 s warm, output
    * hash-identical). At lake scale the hub count is the knob — the
    * collected state stays hubs²-bounded regardless of corpus size. */
  private[graft] def sccHubs(s: SparkSession, d: String): DataFrame = {
    val e = QRound9bq.seqEdges(s, d)
    val hubs = e.groupBy("a").agg(count(lit(1)).as("odeg"))
      .orderBy(col("odeg").desc, col("a")).limit(sccHubCount)
      .select(col("a").as("v"))
    val sub = e
      .join(broadcast(hubs.select(col("v").as("a"))), Seq("a"), "left_semi")
      .join(broadcast(hubs.select(col("v").as("b"))), Seq("b"), "left_semi")
      .select("a", "b")
    // ONE bounded collect: the ≤16 hubs and their ≤256 internal edges.
    // The bounds are ASSERTED (VERDICT r11 #4): if the hub knob is ever
    // raised to something row-scale, this fails loudly instead of
    // silently turning the collect into a corpus-sized driver pull.
    val hubSet = hubs.collect().map(_.getLong(0))
    require(hubSet.length <= sccHubCount,
      s"hub collect ${hubSet.length} exceeds the $sccHubCount bound")
    val subPairs = sub.collect().map(r => (r.getLong(0), r.getLong(1)))
    require(subPairs.length <= sccHubCount * sccHubCount,
      s"hub-subgraph collect ${subPairs.length} exceeds the " +
        s"hubs² bound ${sccHubCount * sccHubCount}")
    // exact integer closure, 4 doubling rounds (paths ≤ 16 > the 15-hop
    // diameter on 16 nodes) — identical arithmetic to the old dataflow
    var reach: Set[(Long, Long)] =
      (subPairs ++ hubSet.map(v => (v, v))).toSet
    for (_ <- 1 to 4) {
      val byA = reach.groupBy(_._1)
      reach = reach ++ reach.flatMap { case (a, m) =>
        byA.getOrElse(m, Set.empty).map { case (_, b) => (a, b) } }
    }
    val mut = reach.filter { case (a, b) => reach((b, a)) }
    val rows = mut.groupBy(_._1).map { case (member, ps) =>
        member -> ps.map(_._2).min }
      .groupBy(_._2).map { case (id, ms) =>
        (id, ms.size.toLong, ms.keys.max) }
      .toSeq.sortBy(_._1)
    s.createDataFrame(rows).toDF("scc_id", "n_members", "max_member")
      .orderBy("scc_id")
  }

  private val oGraphSccHubs =
    s"""WITH RECURSIVE seq AS (SELECT l_orderkey, l_partkey AS b,
       |    lag(l_partkey) OVER (PARTITION BY l_orderkey
       |      ORDER BY l_linenumber, l_partkey) AS a
       |  FROM lineitem),
       |e AS MATERIALIZED (SELECT DISTINCT a, b FROM seq
       |  WHERE a IS NOT NULL AND a <> b),
       |hubs AS MATERIALIZED (SELECT a AS v FROM (
       |  SELECT a, count(*) AS odeg FROM e GROUP BY 1
       |  ORDER BY odeg DESC, a LIMIT $sccHubCount)),
       |se AS MATERIALIZED (SELECT a, b FROM e
       |  WHERE a IN (SELECT v FROM hubs) AND b IN (SELECT v FROM hubs)),
       |reach(a, b) AS (
       |  SELECT v, v FROM hubs
       |  UNION
       |  SELECT se.a, se.b FROM se
       |  UNION
       |  SELECT r.a, se.b FROM reach r JOIN se ON se.a = r.b),
       |mut AS (SELECT r.a AS member, r.b AS u FROM reach r
       |  WHERE EXISTS (SELECT 1 FROM reach q
       |    WHERE q.a = r.b AND q.b = r.a)),
       |scc AS (SELECT member, min(u) AS scc_id FROM mut GROUP BY 1)
       |SELECT scc_id, CAST(count(*) AS BIGINT) AS n_members,
       |  CAST(max(member) AS BIGINT) AS max_member
       |FROM scc GROUP BY 1 ORDER BY scc_id""".stripMargin

  val queries: Map[String, QFn] = Map(
    "agg_spearman_rank" -> aggSpearmanRank _,
    "ts_sample_entropy" -> tsSampleEntropy _,
    "graph_scc_hubs"    -> ((s, d) => sccHubs(s, d)))

  val oracles: Map[String, String] = Map(
    "agg_spearman_rank" -> oAggSpearmanRank,
    "ts_sample_entropy" -> oTsSampleEntropy,
    "graph_scc_hubs"    -> oGraphSccHubs)
}
