package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 11 (SURVEY §2.27):
  *
  *  - `sample_temperature_mix`: temperature-scaled language sampling
  *    weights (p^α re-normalization, the XLM-R/mT5 multilingual recipe —
  *    Conneau et al. 2020 §3.1) — the low-resource up-sampler beside the
  *    plain domain mix.
  *  - `graph_hits_scores`: HITS hub/authority scores over the DIRECTED
  *    kNN graph in integer-normalized fixed rounds — the second
  *    eigen-centrality beside PageRank, with zero floating point.
  *  - `scan_csv_malformed`: PERMISSIVE CSV ingestion over a landing file
  *    with planted corrupt rows — the robust-ingestion contract
  *    (corrupt-record accounting) every lake loader needs.
  *  - `ts_theilsen_trend`: Theil–Sen median-of-pairwise-slopes trend per
  *    event-type daily series — the robust regression beside the
  *    drift-method forecast and the Hampel/MAD outlier filters.
  */
object QRound9l extends QueryPack {

  // ---- sample_temperature_mix ----

  /** Temperature-scaled sampling mix over languages: q_l ∝ p_l^α with
    * α = 0.7, where p_l is the language's share of total token mass
    * (n_chars as the mass proxy). Low-resource languages are up-sampled
    * (boost = q/p > 1), the head language is down-sampled — the
    * multilingual data-mix standard. Engine-stable: p^α = exp(α·ln p) is
    * computed per language from exact long masses, scaled-to-long
    * (floor(x·1e12+0.5)); the normalizer is the exact sum of those longs;
    * p, q, boost are single divisions of exact longs, trunc6/trunc4'd.
    *
    * Scale shape: one documents pass → a #langs-bounded aggregate; the
    * 1-row total and the #langs-row weight table broadcast. */
  private[graft] def temperatureMix(docs: DataFrame): DataFrame = {
    val per = docs.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("mass"))
    val tot = per.agg(sum(col("mass")).as("tmass"))
    val scaled = per.crossJoin(broadcast(tot))
      .withColumn("pw_scaled",
        floor(exp(lit(7e-1) * log(col("mass").cast(DoubleType) /
          col("tmass").cast(DoubleType))) * lit(1e12) + lit(5e-1))
          .cast(LongType))
    val norm = scaled.agg(sum(col("pw_scaled")).as("z"))
    scaled.crossJoin(broadcast(norm))
      .select(col("lang"), col("n_docs"), col("mass"),
        trunc6(col("mass").cast(DoubleType) / col("tmass")).as("p_share"),
        trunc6(col("pw_scaled").cast(DoubleType) / col("z")).as("q_share"),
        trunc4((col("pw_scaled").cast(DoubleType) / col("z")) /
          (col("mass").cast(DoubleType) / col("tmass"))).as("boost"))
      .orderBy("lang")
  }

  private def sampleTemperatureMix(s: SparkSession, d: String): DataFrame =
    temperatureMix(t(s, d, "documents"))

  private val oSampleTemperatureMix =
    s"""WITH per AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(n_chars) AS BIGINT) AS mass FROM documents GROUP BY 1),
       |tot AS (SELECT CAST(sum(mass) AS BIGINT) AS tmass FROM per),
       |sc AS (SELECT lang, n_docs, mass, tmass,
       |    CAST(floor(exp(7e-1 * ln(CAST(mass AS DOUBLE) /
       |      CAST(tmass AS DOUBLE))) * 1e12 + 5e-1) AS BIGINT) AS pw
       |  FROM per, tot),
       |nz AS (SELECT CAST(sum(pw) AS BIGINT) AS z FROM sc)
       |SELECT lang, n_docs, mass,
       |  ${oTrunc6("CAST(mass AS DOUBLE) / tmass")} AS p_share,
       |  ${oTrunc6("CAST(pw AS DOUBLE) / z")} AS q_share,
       |  ${oTrunc4("(CAST(pw AS DOUBLE) / z) / (CAST(mass AS DOUBLE) / tmass)")}
       |    AS boost
       |FROM sc, nz ORDER BY lang""".stripMargin

  // ---- graph_hits_scores ----

  private val hitsRounds = 4

  /** HITS hub/authority over the DIRECTED kNN edge list (vec → its k
    * nearest), in fixed integer-normalized rounds: hubs start at 1e6;
    * each round authority(v) = Σ hub over in-edges, re-scaled to
    * max 1e6 by integer floor-division; then hub(v) = Σ authority over
    * out-edges, re-scaled the same way. Every value in every round is an
    * exact BIGINT — the iteration has zero floating point, so it is
    * bit-identical across engines and partitionings with no trunc
    * discipline needed. Nodes without in-(out-)edges score 0.
    *
    * Scale shape: per round two vertex-keyed equi-join+aggregate passes
    * over the bounded kNN edge list (the PageRank/BFS shuffle shape);
    * the 1-row max broadcasts; fixed rounds → MATERIALIZED-CTE oracle
    * unroll. Lineage is short (state referenced once per round), so no
    * checkpoint is needed. */
  private[graft] def hitsScores(nodes: DataFrame, edges: DataFrame)
      : DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // The per-round max is 1-row MODEL STATE: collecting it as a scalar
    // (the k-means/k-center discipline) keeps each aggregate referenced
    // exactly ONCE in the next state's plan — linear plan growth with no
    // per-round checkpoint. The max collect doubles as the job that
    // materializes the persisted aggregate; each cache is unpersisted as
    // soon as its last consumer has run (one live round in memory).
    var hub = nodes.select(col("vec_id").as("node"), lit(1000000L).as("h"))
    var auth = hub.select(col("node"), lit(0L).as("a"))
    var prev: List[DataFrame] = Nil
    for (_ <- 1 to hitsRounds) {
      val araw = edges.join(hub, col("src") === col("node"))
        .groupBy(col("dst")).agg(sum(col("h")).as("ar"))
        .persist(MEMORY_AND_DISK)
      val am = araw.agg(max(col("ar"))).head().getLong(0)
      prev.foreach(_.unpersist(false)); prev = Nil
      auth = nodes.select(col("vec_id").as("node"))
        .join(araw, col("node") === col("dst"), "left")
        .select(col("node"),
          coalesce(expr(s"ar * 1000000 div ${am}L"), lit(0L)).as("a"))
      val hraw = edges.join(auth, col("dst") === col("node"))
        .groupBy(col("src")).agg(sum(col("a")).as("hr"))
        .persist(MEMORY_AND_DISK)
      val hm = hraw.agg(max(col("hr"))).head().getLong(0)
      araw.unpersist(false)
      hub = nodes.select(col("vec_id").as("node"))
        .join(hraw, col("node") === col("src"), "left")
        .select(col("node"),
          coalesce(expr(s"hr * 1000000 div ${hm}L"), lit(0L)).as("h"))
      prev = List(hraw)
    }
    // with the maxes baked in as literals the returned plan is one
    // LINEAR 16-join chain — drop the loop caches and let the final
    // materialization re-run it in a single job (callers memoize+persist
    // the result, so the chain runs once per session)
    prev.foreach(_.unpersist(false))
    hub.join(auth.withColumnRenamed("node", "n2"), col("node") === col("n2"))
      .select(col("node").as("vec_id"), col("h").as("hub_score"),
        col("a").as("auth_score"))
      .orderBy("vec_id")
  }

  private def graphHitsScores(s: SparkSession, d: String): DataFrame =
    graft.Memo.memo(s, "hitsscores", d)(
      hitsScores(
        QSim.embPersisted(s, d).select("vec_id"),
        QSim.knnJoinPersisted(s, d)
          .select(col("vec_id").as("src"), col("nbr_id").as("dst")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  private val oGraphHitsScores = {
    val rounds = (1 to hitsRounds).map { r =>
      s"""ar$r AS MATERIALIZED (SELECT e.dst AS node,
         |    CAST(sum(h.h) AS BIGINT) AS ar
         |  FROM edges e JOIN hub${r - 1} h ON h.node = e.src GROUP BY 1),
         |auth$r AS MATERIALIZED (SELECT n.vec_id AS node,
         |    coalesce(a.ar * 1000000 // (SELECT max(ar) FROM ar$r), 0) AS a
         |  FROM nodes n LEFT JOIN ar$r a ON a.node = n.vec_id),
         |hr$r AS MATERIALIZED (SELECT e.src AS node,
         |    CAST(sum(a.a) AS BIGINT) AS hr
         |  FROM edges e JOIN auth$r a ON a.node = e.dst GROUP BY 1),
         |hub$r AS MATERIALIZED (SELECT n.vec_id AS node,
         |    coalesce(h.hr * 1000000 // (SELECT max(hr) FROM hr$r), 0) AS h
         |  FROM nodes n LEFT JOIN hr$r h ON h.node = n.vec_id),"""
        .stripMargin
    }.mkString("\n")
    s"""WITH knn AS MATERIALIZED (SELECT vec_id AS src, nbr_id AS dst
       |  FROM (${QSim.oracles("sim_knn_join")})),
       |edges AS MATERIALIZED (SELECT src, dst FROM knn),
       |nodes AS (SELECT vec_id FROM embeddings),
       |hub0 AS (SELECT vec_id AS node, CAST(1000000 AS BIGINT) AS h
       |  FROM nodes),
       |$rounds
       |fin AS (SELECT h.node, h.h, a.a
       |  FROM hub$hitsRounds h JOIN auth$hitsRounds a ON a.node = h.node)
       |SELECT node AS vec_id, CAST(h AS BIGINT) AS hub_score,
       |  CAST(a AS BIGINT) AS auth_score
       |FROM fin ORDER BY vec_id""".stripMargin
  }

  // ---- scan_csv_malformed ----

  /** PERMISSIVE CSV ingestion with corrupt-record accounting: the events
    * table staged as a CSV landing file with every 97th event's `value`
    * field deliberately corrupted (non-numeric). The read schema carries
    * a `columnNameOfCorruptRecord` column; PERMISSIVE mode keeps the
    * parseable fields, nulls the broken one, and preserves the raw line —
    * the loader then accounts (good, corrupt, exact cents over good
    * rows) per user bucket. The oracle replays the corruption rule
    * analytically from the source table, so a parser that drops, double-
    * counts, or mis-flags any line breaks the hash.
    *
    * Scale shape: file-parallel CSV scan (splittable, no multiline);
    * per-row parse + one bounded-key (10-bucket) aggregate. */
  private[graft] def stagedMalformedCsv(s: SparkSession, d: String): String =
    QRound3.staged(s, d, "evcsvbad") { dir =>
      t(s, d, "events")
        .select(concat_ws(",",
          col("event_id"), col("user_id"),
          when(col("event_id") % 97 === 0,
            concat(lit("bad"), col("value").cast(StringType)))
            .otherwise(col("value").cast(StringType))).as("value"))
        .coalesce(1).write.mode("overwrite").text(dir)
    }

  private def scanCsvMalformed(s: SparkSession, d: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("value", DoubleType), StructField("_bad", StringType)))
    s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .csv(stagedMalformedCsv(s, d))
      .groupBy((col("user_id") % 10).as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("_bad").isNotNull, 1L).otherwise(0L)).as("n_corrupt"),
        sum(when(col("_bad").isNull,
          floor(col("value") * lit(1e2) + lit(5e-1)).cast(LongType))
          .otherwise(0L)).as("cents_good"))
      .orderBy("bucket")
  }

  private val oScanCsvMalformed =
    """SELECT user_id % 10 AS bucket, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CASE WHEN event_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_corrupt,
      |  CAST(sum(CASE WHEN event_id % 97 <> 0
      |    THEN CAST(floor(value * 1e2 + 5e-1) AS BIGINT) ELSE 0 END)
      |    AS BIGINT) AS cents_good
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- ts_theilsen_trend ----

  /** Theil–Sen trend per event-type daily series: the MEDIAN of all
    * pairwise slopes (cnt_j−cnt_i)/(day_j−day_i), i < j — robust to the
    * outlier days that drag a least-squares slope (the robust twin of
    * `ts_forecast_drift`'s mean slope). Each slope is one double
    * division of exact longs; the median interpolates the middle pair
    * identically in both engines ((a+b)/2 on doubles is exact);
    * trunc6'd.
    *
    * Scale shape: the pair space is the DOMAIN-bounded triangular join
    * over the ≤window-days daily series (the `chp_survival_km` /
    * `join_theta_range` pattern — never over raw events); per-type
    * windows only. */
  private[graft] def theilsenTrend(daily: DataFrame): DataFrame = {
    val a = daily.select(col("event_type"), col("day_num").as("di"),
      col("cnt").as("ci"))
    val b = daily.select(col("event_type").as("tb"),
      col("day_num").as("dj"), col("cnt").as("cj"))
    a.join(b, col("event_type") === col("tb") && col("dj") > col("di"))
      .select(col("event_type"),
        ((col("cj") - col("ci")).cast(DoubleType) /
          (col("dj") - col("di")).cast(DoubleType)).as("slope"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_pairs"),
        trunc6(expr("percentile(slope, 0.5)")).as("slope_med"))
      .orderBy("event_type")
  }

  private def tsTheilsenTrend(s: SparkSession, d: String): DataFrame =
    theilsenTrend(QRound9b.evDaily(s, d))

  private val oTsTheilsenTrend =
    s"""WITH daily AS (SELECT event_type,
       |    epoch_us(date_trunc('day', ts)) // 86400000000 AS day_num,
       |    CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
       |slopes AS (SELECT a.event_type,
       |    CAST(b.cnt - a.cnt AS DOUBLE) / CAST(b.day_num - a.day_num AS DOUBLE)
       |      AS slope
       |  FROM daily a JOIN daily b ON b.event_type = a.event_type
       |    AND b.day_num > a.day_num)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
       |  ${oTrunc6("median(slope)")} AS slope_med
       |FROM slopes GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, QFn] = Map(
    "sample_temperature_mix" -> sampleTemperatureMix _,
    "graph_hits_scores"      -> graphHitsScores _,
    "scan_csv_malformed"     -> scanCsvMalformed _,
    "ts_theilsen_trend"      -> tsTheilsenTrend _)

  val oracles: Map[String, String] = Map(
    "sample_temperature_mix" -> oSampleTemperatureMix,
    "graph_hits_scores"      -> oGraphHitsScores,
    "scan_csv_malformed"     -> oScanCsvMalformed,
    "ts_theilsen_trend"      -> oTsTheilsenTrend)
}
