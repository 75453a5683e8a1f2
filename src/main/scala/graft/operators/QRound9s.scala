package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 18 (SURVEY §2.28):
  *
  *  - `ts_max_drawdown`: running-peak maximum drawdown per event-type
  *    daily series — the worst peak-to-trough collapse, the
  *    finance-classic robustness summary in exact integers.
  *  - `mm_audio_zcr`: zero-crossing rate over the RIFF/WAVE sample
  *    stream — the cheapest voiced/unvoiced-style audio texture
  *    feature, integer-exact through the real byte-level decode.
  *  - `join_null_safe`: the null-safe equality JOIN (`<=>` /
  *    IS NOT DISTINCT FROM) — the join surface where NULL keys match
  *    each other instead of silently dropping.
  */
object QRound9s extends QueryPack {

  // ---- ts_max_drawdown ----

  /** Maximum drawdown per event-type daily series: dd_t = (running peak
    * up to t) − x_t; the report is the worst dd, the peak it fell from,
    * and the day it bottomed (earliest day tiebreak). Pure integers —
    * one running-max window pass and one argmax via ranking window.
    *
    * Scale shape: shares the memoized `evdaily`; both windows are
    * partitioned per event_type; output is one row per type. */
  private[graft] def maxDrawdown(daily: DataFrame): DataFrame = {
    val wRun = Window.partitionBy("event_type").orderBy("day_num")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dd = daily
      .withColumn("peak", max(col("cnt")).over(wRun))
      .withColumn("dd", col("peak") - col("cnt"))
    val wPick = Window.partitionBy("event_type")
      .orderBy(col("dd").desc, col("day_num").asc)
    dd.withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("peak").as("peak_cnt"),
        col("cnt").as("trough_cnt"), col("dd").as("max_drawdown"),
        col("day_num").as("trough_day"))
      .orderBy("event_type")
  }

  private def tsMaxDrawdown(s: SparkSession, d: String): DataFrame =
    maxDrawdown(QRound9b.evDaily(s, d))

  private val oTsMaxDrawdown =
    """WITH daily AS (SELECT event_type,
      |    epoch_us(date_trunc('day', ts)) // 86400000000 AS day_num,
      |    CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
      |dd AS (SELECT event_type, day_num, cnt,
      |    CAST(max(cnt) OVER (PARTITION BY event_type ORDER BY day_num
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS peak
      |  FROM daily),
      |rk AS (SELECT event_type, peak, cnt, peak - cnt AS d, day_num,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY peak - cnt DESC, day_num) AS rn
      |  FROM dd)
      |SELECT event_type, peak AS peak_cnt, cnt AS trough_cnt,
      |  CAST(d AS BIGINT) AS max_drawdown, day_num AS trough_day
      |FROM rk WHERE rn = 1 ORDER BY event_type""".stripMargin

  // ---- mm_audio_zcr ----

  /** Zero-crossing rate through the real RIFF/WAVE parse: a crossing is
    * an adjacent sample pair whose signs (s ≥ 0 vs s < 0) differ; the
    * rate divides by n−1 (trunc4 — the only non-integer). High ZCR ⇒
    * noisy/fricative texture, low ⇒ tonal — the classic first audio
    * feature beside windowed energy. The oracle replays the synthesis
    * formula per sample index, so any header-parse or sample-order bug
    * breaks the hash.
    *
    * Scale shape: per-partition batch decode (the mm family shape);
    * only the per-media 3-column rollup shuffles. */
  private[graft] def audioZcr(media: org.apache.spark.sql.Dataset[
      Multimodal.MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      Multimodal.decodeWavSamples(r.payload).flatMap { s =>
        if (s.length < 2) None
        else {
          var c = 0L
          var i = 1
          while (i < s.length) {
            if ((s(i - 1) >= 0) != (s(i) >= 0)) c += 1
            i += 1
          }
          Some((r.media_id, s.length.toLong, c))
        }
      }
    }).toDF("media_id", "n_samples", "n_crossings")
      .select(col("media_id"), col("n_samples"), col("n_crossings"),
        trunc4(col("n_crossings").cast(DoubleType) /
          (col("n_samples") - 1).cast(DoubleType)).as("zcr"))
      .orderBy("media_id")
  }

  private def mmAudioZcr(s: SparkSession, d: String): DataFrame =
    audioZcr(Multimodal.audioFromDocuments(s, d))

  private val oMmAudioZcr =
    s"""WITH d AS (SELECT doc_id, CAST(64 + doc_id % 64 AS BIGINT) AS n
       |  FROM documents),
       |sm AS (SELECT doc_id, n, i.i,
       |    (doc_id * 37 + i.i * 11) % 2048 - 1024 AS s
       |  FROM d, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i) i),
       |fl AS (SELECT doc_id, n,
       |    CASE WHEN (s >= 0) <>
       |      (lead(s) OVER (PARTITION BY doc_id ORDER BY i) >= 0)
       |      THEN 1 ELSE 0 END AS x
       |  FROM sm),
       |cr AS (SELECT doc_id, n, CAST(sum(x) AS BIGINT) AS c
       |  FROM fl GROUP BY doc_id, n)
       |SELECT doc_id AS media_id, n AS n_samples, c AS n_crossings,
       |  ${oTrunc4("CAST(c AS DOUBLE) / CAST(n - 1 AS DOUBLE)")} AS zcr
       |FROM cr ORDER BY media_id""".stripMargin

  // ---- join_null_safe ----

  /** Null-safe equality join: user groups carry a planted NULL key
    * (nullif(user_id % 7, 3)) and join their group-size dim with `<=>`
    * — NULL keys MATCH each other (a plain `=` would silently drop ~1/7
    * of users, the classic outer-key bug). The same predicate spells
    * IS NOT DISTINCT FROM in the oracle.
    *
    * Scale shape: null-safe equality still plans as a hash join on the
    * coalesced key — one shuffle each side, no BNLJ. */
  private[graft] def nullSafeJoin(events: DataFrame): DataFrame = {
    val users = events.select(col("user_id")).distinct()
      .withColumn("grp", expr("nullif(user_id % 7, 3)"))
    val dim = users.groupBy("grp").agg(count(lit(1)).as("grp_size"))
      .select(col("grp").as("dgrp"), col("grp_size"))
    users.join(dim, col("grp") <=> col("dgrp"))
      .select(col("user_id"), col("grp"), col("grp_size"))
      .orderBy("user_id")
  }

  private def joinNullSafe(s: SparkSession, d: String): DataFrame =
    nullSafeJoin(t(s, d, "events"))

  private val oJoinNullSafe =
    """WITH users AS (SELECT DISTINCT user_id,
      |    nullif(user_id % 7, 3) AS grp FROM events),
      |dim AS (SELECT grp AS dgrp, CAST(count(*) AS BIGINT) AS grp_size
      |  FROM users GROUP BY 1)
      |SELECT u.user_id, u.grp, d.grp_size
      |FROM users u JOIN dim d ON u.grp IS NOT DISTINCT FROM d.dgrp
      |ORDER BY u.user_id""".stripMargin

  val queries: Map[String, QFn] = Map(
    "ts_max_drawdown" -> tsMaxDrawdown _,
    "mm_audio_zcr"    -> mmAudioZcr _,
    "join_null_safe"  -> joinNullSafe _)

  val oracles: Map[String, String] = Map(
    "ts_max_drawdown" -> oTsMaxDrawdown,
    "mm_audio_zcr"    -> oMmAudioZcr,
    "join_null_safe"  -> oJoinNullSafe)
}
