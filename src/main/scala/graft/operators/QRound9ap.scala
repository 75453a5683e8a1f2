package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Round-9 extension wave 41 (SURVEY §2.28):
  *
  *  - `chp_bounce_rate`: daily bounce rate (share of single-event
  *    sessions) — the engagement-quality metric next to DAU.
  *  - `ts_anomaly_stl`: anomalies on the STL RESIDUAL (seasonal-aware
  *    z-score) — catches the 3am spike a plain z-score calls normal and
  *    ignores the 9am rush a plain z-score calls anomalous.
  *  - `mm_image_quadrant_stats`: 2×2 tile channel means per image
  *    through the real P6 decode — the localized color features a
  *    layout/crop heuristic consumes.
  */
object QRound9ap extends QueryPack {

  // ---- chp_bounce_rate ----

  /** Daily bounce rate: sessionize per user (30-min gaps, the
    * chp_sessionize_batch discipline), a session's day = its first
    * event's day, bounce = single-event session. Emits per-day session
    * count, bounce count, trunc4 rate.
    *
    * Scale shape: sessionization windows partition by user; the
    * per-day rollup partial-aggregates on ~30 day keys. */
  private[graft] def bounceRate(events: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy("us", "event_id")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = events
      .select(col("user_id"), col("event_id"), col("ts"),
        expr("unix_micros(cast(ts as timestamp))").as("us"))
      .withColumn("prev_us", lag("us", 1).over(wOrd))
      .withColumn("new_sess",
        (col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L)
          .cast(LongType))
      .withColumn("session_idx", sum("new_sess").over(wRun))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        date_trunc("day", min("ts")).as("day"))
    sess.groupBy("day")
      .agg(count(lit(1)).as("n_sessions"),
        sum((col("n_events") === 1).cast(LongType)).as("n_bounce"))
      .select(col("day"), col("n_sessions"), col("n_bounce"),
        trunc4(col("n_bounce").cast(DoubleType) /
          col("n_sessions").cast(DoubleType)).as("bounce_rate"))
      .orderBy("day")
  }

  private def chpBounceRate(s: SparkSession, d: String): DataFrame =
    bounceRate(t(s, d, "events"))

  private val oChpBounceRate =
    s"""WITH e AS (SELECT user_id, event_id, ts, epoch_us(ts) AS us
       |  FROM events),
       |l AS (SELECT *, lag(us) OVER (PARTITION BY user_id
       |    ORDER BY us, event_id) AS prev_us FROM e),
       |f AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
       |    THEN 1 ELSE 0 END AS new_sess FROM l),
       |g AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
       |    ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS session_idx
       |  FROM f),
       |sess AS (SELECT user_id, session_idx,
       |    CAST(count(*) AS BIGINT) AS n_events,
       |    date_trunc('day', min(ts)) AS day
       |  FROM g GROUP BY 1, 2)
       |SELECT day, CAST(count(*) AS BIGINT) AS n_sessions,
       |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_bounce,
       |  ${oTrunc4("CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)")} AS bounce_rate
       |FROM sess GROUP BY day ORDER BY day""".stripMargin

  // ---- ts_anomaly_stl ----

  /** Seasonal-aware anomaly detection: z-score the STL RESIDUAL (trend
    * and hour-of-day effects removed) per series and flag |z| > 2.5.
    * Emits only alerting hours with the decomposition context. Residual
    * mean/σ come from scale-to-long exact sums (residuals are arbitrary
    * doubles); z trunc4 before the threshold compare.
    *
    * Scale shape: composes the declared STL pipeline (same partitioned
    * windows); residual stats are one bounded per-series aggregate
    * broadcast back. */
  private[graft] def anomalyStl(events: DataFrame): DataFrame = {
    val decomp = QRound9al.stlDecompose(events)
    def sl(c: org.apache.spark.sql.Column) =
      sum(floor(c * lit(1e12) + lit(0.5)).cast(DecimalType(38, 0)))
        .cast(DoubleType) / lit(1e12)
    val stats = decomp.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sl(col("resid")).as("s1"),
        sl(col("resid") * col("resid")).as("s2"))
      .select(col("event_type"),
        (col("s1") / col("n").cast(DoubleType)).as("mu"),
        sqrt((col("s2") / col("n").cast(DoubleType)) -
          ((col("s1") / col("n").cast(DoubleType)) *
            (col("s1") / col("n").cast(DoubleType)))).as("sigma"))
    decomp.join(broadcast(stats), Seq("event_type"))
      .withColumn("z", trunc4((col("resid") - col("mu")) / col("sigma")))
      .filter(abs(col("z")) > lit(25e-1))
      .select(col("event_type"), col("hr"), col("x"), col("trend"),
        col("seasonal"), col("resid"), col("z"))
      .orderBy("event_type", "hr")
  }

  private def tsAnomalyStl(s: SparkSession, d: String): DataFrame =
    anomalyStl(t(s, d, "events"))

  private val oTsAnomalyStl = {
    val oStl = QRound9al.oracles("ts_stl_decompose")
    def sl(c: String) =
      s"CAST(sum(CAST(floor(($c) * 1e12 + 5e-1) AS HUGEINT)) AS DOUBLE) / 1e12"
    s"""WITH stl AS (SELECT * FROM ($oStl)),
       |st AS (SELECT event_type, count(*) AS n,
       |    ${sl("resid")} AS s1, ${sl("resid * resid")} AS s2
       |  FROM stl GROUP BY 1),
       |z AS (SELECT stl.*, ${oTrunc4("(stl.resid - (st.s1 / st.n)) / sqrt((st.s2 / st.n) - ((st.s1 / st.n) * (st.s1 / st.n)))")} AS z
       |  FROM stl JOIN st ON stl.event_type = st.event_type)
       |SELECT event_type, hr, x, trend, seasonal, resid, z
       |FROM z WHERE abs(z) > 25e-1
       |ORDER BY event_type, hr""".stripMargin
  }

  // ---- mm_image_quadrant_stats ----

  /** 2×2 tile mean channel values per image through the real P6 decode
    * (quadrant = left/right of ⌈w/2⌉ × top/bottom of ⌈h/2⌉): the
    * localized color features a crop/layout heuristic consumes. Exact
    * integer sums; trunc4 means. The oracle replays the synthesis per
    * pixel with the same quadrant predicate.
    *
    * Scale shape: per-image 4×3 cell sums fold inside mapPartitions —
    * 4 rows per media leave each task, not pixels. */
  private[graft] def quadrantStats(media: org.apache.spark.sql.Dataset[
      Multimodal.MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      Multimodal.pixelPlane(r.payload).toSeq.flatMap { case (w, h, px) =>
        val halfW = (w + 1) / 2
        val halfH = (h + 1) / 2
        // quadrant q = 2*(row >= halfH) + (col >= halfW): 0=TL 1=TR 2=BL 3=BR
        val sums = Array.ofDim[Long](4, 3)
        val cnts = new Array[Long](4)
        var j = 0
        val n = w * h
        while (j < n) {
          val row = j / w
          val colI = j % w
          val q = (if (row >= halfH) 2 else 0) + (if (colI >= halfW) 1 else 0)
          sums(q)(0) += px(3 * j) & 0xff
          sums(q)(1) += px(3 * j + 1) & 0xff
          sums(q)(2) += px(3 * j + 2) & 0xff
          cnts(q) += 1
          j += 1
        }
        (0 until 4).filter(cnts(_) > 0).map { q =>
          (r.media_id, q.toLong, cnts(q),
            sums(q)(0), sums(q)(1), sums(q)(2))
        }
      }
    }).toDF("media_id", "quadrant", "n_px", "r_sum", "g_sum", "b_sum")
      .select(col("media_id"), col("quadrant"), col("n_px"),
        trunc4(col("r_sum").cast(DoubleType) / col("n_px").cast(DoubleType))
          .as("r_mean"),
        trunc4(col("g_sum").cast(DoubleType) / col("n_px").cast(DoubleType))
          .as("g_mean"),
        trunc4(col("b_sum").cast(DoubleType) / col("n_px").cast(DoubleType))
          .as("b_mean"))
      .orderBy("media_id", "quadrant")
  }

  private def mmImageQuadrantStats(s: SparkSession, d: String): DataFrame =
    quadrantStats(Multimodal.mediaFromPpm(s, d))

  private val oMmImageQuadrantStats =
    s"""WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
       |  FROM documents),
       |px AS (SELECT doc_id, w, h, j.j,
       |    (j.j // w) AS rw, (j.j % w) AS cl,
       |    (doc_id * 31 + (3 * j.j) * 7) % 256 AS r,
       |    (doc_id * 31 + (3 * j.j + 1) * 7) % 256 AS g,
       |    (doc_id * 31 + (3 * j.j + 2) * 7) % 256 AS b
       |  FROM d, LATERAL (SELECT unnest(generate_series(0, w * h - 1)) AS j) j),
       |q AS (SELECT doc_id AS media_id,
       |    CAST((CASE WHEN rw >= (h + 1) // 2 THEN 2 ELSE 0 END +
       |      CASE WHEN cl >= (w + 1) // 2 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS quadrant,
       |    r, g, b FROM px)
       |SELECT media_id, quadrant, CAST(count(*) AS BIGINT) AS n_px,
       |  ${oTrunc4("CAST(sum(r) AS DOUBLE) / count(*)")} AS r_mean,
       |  ${oTrunc4("CAST(sum(g) AS DOUBLE) / count(*)")} AS g_mean,
       |  ${oTrunc4("CAST(sum(b) AS DOUBLE) / count(*)")} AS b_mean
       |FROM q GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, QFn] = Map(
    "chp_bounce_rate"         -> chpBounceRate _,
    "ts_anomaly_stl"          -> tsAnomalyStl _,
    "mm_image_quadrant_stats" -> mmImageQuadrantStats _)

  val oracles: Map[String, String] = Map(
    "chp_bounce_rate"         -> oChpBounceRate,
    "ts_anomaly_stl"          -> oTsAnomalyStl,
    "mm_image_quadrant_stats" -> oMmImageQuadrantStats)
}
