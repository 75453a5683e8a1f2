package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 16 (SURVEY §2.28):
  *
  *  - `join_spatial_grid`: fixed-radius spatial neighbor join on the 2-D
  *    PCA plane via grid-cell decomposition — the spatial-join shape
  *    (bucketed 2-D range probe) beside the 1-D interval families.
  *  - `ts_periodogram_probe`: Goertzel-style spectral power at candidate
  *    periods (2, 3, 7 days) per event-type daily series — "is there a
  *    weekly cycle" asked directly, beside the day-of-week index.
  *  - `pipeline_dataset_card`: the 1-row corpus datasheet (counts,
  *    language/source spread, token mass, exact-dup rate, top language)
  *    — the summary table a dataset release ships.
  */
object QRound9q extends QueryPack {

  // ---- join_spatial_grid ----

  private val gridR = 5e-1

  /** Fixed-radius neighbor search on the PCA plane: for each of the 20
    * standing query points, count corpus points within Euclidean radius
    * r = 0.5 (and report the nearest squared distance). Cells of side r
    * make the candidate set exact: any point within r of q lies in q's
    * 3×3 cell neighborhood, so the probe explodes 9 cells per query and
    * equi-joins on the cell key — never a 20×N theta join. Distances are
    * squared doubles of the hash-verified trunc'd projection (identical
    * inputs ⇒ identical doubles in both engines); the radius cut
    * compares against the `25e-2` literal.
    *
    * Scale shape: the corpus is cell-bucketed once (uniform keys); the
    * 20×9 probe side broadcasts; per-query rollups are bounded. The same
    * plan serves billions of points — the cell index is the spatial
    * analogue of the LSH band join. */
  private[graft] def spatialGrid(proj: DataFrame): DataFrame = {
    val cand = proj.select(col("vec_id"), col("pc1"), col("pc2"),
      floor(col("pc1") / lit(gridR)).cast(LongType).as("cx"),
      floor(col("pc2") / lit(gridR)).cast(LongType).as("cy"))
    val q = proj.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("pc1").as("q1"),
        col("pc2").as("q2"))
    val probes = q
      .crossJoin(broadcast(
        proj.sparkSession.range(-1, 2).select(col("id").as("dx"))))
      .crossJoin(broadcast(
        proj.sparkSession.range(-1, 2).select(col("id").as("dy"))))
      .select(col("qid"), col("q1"), col("q2"),
        (floor(col("q1") / lit(gridR)).cast(LongType) + col("dx")).as("cx"),
        (floor(col("q2") / lit(gridR)).cast(LongType) + col("dy")).as("cy"))
    val d2 = (col("pc1") - col("q1")) * (col("pc1") - col("q1")) +
      (col("pc2") - col("q2")) * (col("pc2") - col("q2"))
    val hits = cand.join(broadcast(probes), Seq("cx", "cy"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), d2.as("d2"))
      .filter(col("d2") <= lit(25e-2))
      .groupBy("qid")
      .agg(count(lit(1)).as("n_within"), trunc6(min(col("d2"))).as("min_d2"))
    q.select(col("qid"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("n_within"), lit(0L)).as("n_within"),
        coalesce(col("min_d2"), lit(-1.0)).as("min_d2"))
      .orderBy("qid")
  }

  private def joinSpatialGrid(s: SparkSession, d: String): DataFrame =
    spatialGrid(QRound7b.queries("emb_pca_project2")(s, d))

  private val oJoinSpatialGrid =
    s"""WITH p AS MATERIALIZED (SELECT * FROM
       |    (${QRound7b.oracles("emb_pca_project2")})),
       |cand AS (SELECT vec_id, pc1, pc2,
       |    CAST(floor(pc1 / 5e-1) AS BIGINT) AS cx,
       |    CAST(floor(pc2 / 5e-1) AS BIGINT) AS cy FROM p),
       |q AS (SELECT vec_id AS qid, pc1 AS q1, pc2 AS q2 FROM p
       |  WHERE vec_id < 20),
       |probes AS (SELECT qid, q1, q2,
       |    CAST(floor(q1 / 5e-1) AS BIGINT) + dx.dx AS cx,
       |    CAST(floor(q2 / 5e-1) AS BIGINT) + dy.dy AS cy
       |  FROM q,
       |    (SELECT unnest(generate_series(-1, 1)) AS dx) dx,
       |    (SELECT unnest(generate_series(-1, 1)) AS dy) dy),
       |hits AS (SELECT pr.qid, CAST(count(*) AS BIGINT) AS n_within,
       |    ${oTrunc6("min((c.pc1 - pr.q1) * (c.pc1 - pr.q1) + " +
         "(c.pc2 - pr.q2) * (c.pc2 - pr.q2))")} AS min_d2
       |  FROM cand c JOIN probes pr USING (cx, cy)
       |  WHERE c.vec_id <> pr.qid
       |    AND (c.pc1 - pr.q1) * (c.pc1 - pr.q1) +
       |        (c.pc2 - pr.q2) * (c.pc2 - pr.q2) <= 25e-2
       |  GROUP BY pr.qid)
       |SELECT q.qid, coalesce(h.n_within, 0) AS n_within,
       |  coalesce(h.min_d2, -1.0) AS min_d2
       |FROM q LEFT JOIN hits h ON h.qid = q.qid
       |ORDER BY q.qid""".stripMargin

  // ---- ts_periodogram_probe ----

  private val probePeriods = Seq(2, 3, 7)

  /** Spectral power at fixed candidate periods per event-type daily
    * series: S_c = Σ x̃_t·cos(2πt/p), S_s = Σ x̃_t·sin(2πt/p),
    * power = S_c² + S_s² — large at period p iff the series cycles at p
    * (the single-frequency DFT probe; the full periodogram is this over
    * all frequencies). The series is MEAN-CENTERED in exact integers
    * (x̃ = n·x − Σx — scaling by n avoids a fractional mean; without
    * centering the DC component leaks comparable power into every
    * period and the probe is useless). t is re-based per type (day −
    * first day) so the trig argument stays small — large-argument
    * reduction is where libm implementations actually diverge. Each
    * term is scaled-to-long (floor(x̃·cos·1e6 + 0.5)) and summed
    * exactly; the power is one double expression over the two exact
    * sums, trunc4'd.
    *
    * Scale shape: shares the memoized `evdaily`; the 3-row period table
    * broadcasts; per-type (first-day, n, total) broadcasts back; output
    * bounded by types×periods. */
  private[graft] def periodogramProbe(daily: DataFrame): DataFrame = {
    val periods = daily.sparkSession
      .createDataFrame(probePeriods.map(Tuple1(_))).toDF("period")
    val base = daily.groupBy(col("event_type").as("tb"))
      .agg(min(col("day_num")).as("d0"), count(lit(1)).as("nd"),
        sum(col("cnt")).as("tot"))
    val tt = (col("day_num") - col("d0")).cast(DoubleType)
    val ang = lit(2.0 * math.Pi) * tt / col("period").cast(DoubleType)
    val ctr = (col("nd") * col("cnt") - col("tot")).cast(DoubleType)
    daily.join(broadcast(base), col("event_type") === col("tb"))
      .crossJoin(broadcast(periods))
      .select(col("event_type"), col("period"),
        floor(ctr * cos(ang) * lit(1e6) + lit(5e-1))
          .cast(LongType).as("tc"),
        floor(ctr * sin(ang) * lit(1e6) + lit(5e-1))
          .cast(LongType).as("ts"))
      .groupBy("event_type", "period")
      .agg(count(lit(1)).as("n_days"),
        sum(col("tc")).as("sc6"), sum(col("ts")).as("ss6"))
      .withColumn("power", trunc4(
        (col("sc6") / lit(1e6)) * (col("sc6") / lit(1e6)) +
        (col("ss6") / lit(1e6)) * (col("ss6") / lit(1e6))))
      .orderBy("event_type", "period")
  }

  private def tsPeriodogramProbe(s: SparkSession, d: String): DataFrame =
    periodogramProbe(QRound9b.evDaily(s, d))

  private val oTsPeriodogramProbe =
    s"""WITH daily AS (SELECT event_type,
       |    epoch_us(date_trunc('day', ts)) // 86400000000 AS day_num,
       |    CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
       |base AS (SELECT event_type, min(day_num) AS d0,
       |    CAST(count(*) AS BIGINT) AS nd, CAST(sum(cnt) AS BIGINT) AS tot
       |  FROM daily GROUP BY 1),
       |periods AS (SELECT unnest([${probePeriods.mkString(", ")}])
       |    AS period),
       |terms AS (SELECT d.event_type, p.period,
       |    CAST(floor(CAST(b.nd * d.cnt - b.tot AS DOUBLE) *
       |      cos(2 * pi() * (d.day_num - b.d0) / p.period) * 1e6 + 5e-1)
       |      AS BIGINT) AS tc,
       |    CAST(floor(CAST(b.nd * d.cnt - b.tot AS DOUBLE) *
       |      sin(2 * pi() * (d.day_num - b.d0) / p.period) * 1e6 + 5e-1)
       |      AS BIGINT) AS ts
       |  FROM daily d JOIN base b USING (event_type), periods p),
       |m AS (SELECT event_type, period, CAST(count(*) AS BIGINT) AS n_days,
       |    CAST(sum(tc) AS BIGINT) AS sc6, CAST(sum(ts) AS BIGINT) AS ss6
       |  FROM terms GROUP BY 1, 2)
       |SELECT event_type, CAST(period AS INT) AS period, n_days, sc6, ss6,
       |  ${oTrunc4("(sc6 / 1e6) * (sc6 / 1e6) + (ss6 / 1e6) * (ss6 / 1e6)")}
       |    AS power
       |FROM m ORDER BY event_type, period""".stripMargin

  // ---- pipeline_dataset_card ----

  /** The dataset card: one row summarizing the corpus the way a dataset
    * release datasheet does — document/language/source counts, exact
    * char and whitespace-token mass, exact-duplicate count (docs minus
    * distinct md5 texts), mean document length, and the majority
    * language. Every number is an exact count or a single trunc4'd
    * ratio.
    *
    * Scale shape: one documents pass for the global aggregate + one
    * bounded lang aggregate (TakeOrderedAndProject for the top row);
    * everything joins as 1-row broadcasts. */
  private[graft] def datasetCard(docs: DataFrame): DataFrame = {
    val agg = docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      sum(col("n_chars")).as("total_chars"),
      sum(size(split(col("text"), " ")).cast(LongType)).as("total_tokens"),
      (count(lit(1)) - countDistinct(md5(col("text").cast(BinaryType))))
        .as("n_dup_docs"))
    val top = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("lang").asc).limit(1)
      .select(col("lang").as("top_lang"), col("n").as("top_lang_docs"))
    agg.crossJoin(broadcast(top))
      .select(col("n_docs"), col("n_langs"), col("n_sources"),
        col("total_chars"), col("total_tokens"), col("n_dup_docs"),
        trunc4(col("total_chars").cast(DoubleType) /
          col("n_docs").cast(DoubleType)).as("mean_chars"),
        col("top_lang"), col("top_lang_docs"))
  }

  private def pipelineDatasetCard(s: SparkSession, d: String): DataFrame =
    datasetCard(t(s, d, "documents"))

  private val oPipelineDatasetCard =
    s"""WITH agg AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT)
       |      AS total_tokens,
       |    CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT)
       |      AS n_dup_docs
       |  FROM documents),
       |top AS (SELECT lang AS top_lang, CAST(count(*) AS BIGINT)
       |    AS top_lang_docs
       |  FROM documents GROUP BY 1
       |  ORDER BY count(*) DESC, lang LIMIT 1)
       |SELECT n_docs, n_langs, n_sources, total_chars, total_tokens,
       |  n_dup_docs,
       |  ${oTrunc4("CAST(total_chars AS DOUBLE) / CAST(n_docs AS DOUBLE)")}
       |    AS mean_chars,
       |  top_lang, top_lang_docs
       |FROM agg, top""".stripMargin

  val queries: Map[String, QFn] = Map(
    "join_spatial_grid"     -> joinSpatialGrid _,
    "ts_periodogram_probe"  -> tsPeriodogramProbe _,
    "pipeline_dataset_card" -> pipelineDatasetCard _)

  val oracles: Map[String, String] = Map(
    "join_spatial_grid"     -> oJoinSpatialGrid,
    "ts_periodogram_probe"  -> oTsPeriodogramProbe,
    "pipeline_dataset_card" -> oPipelineDatasetCard)
}
