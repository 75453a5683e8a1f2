package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 44 (SURVEY §2.28):
  *
  *  - `ts_lttb_downsample`: largest-triangle downsampling of the hourly
  *    event series to k=24 visual buckets per type — the parallel
  *    bucket-mean-anchor variant of LTTB (Steinarsson 2013), exact in
  *    integers.
  *  - `text_vocab_jsd`: Jensen–Shannon divergence between the unigram
  *    distributions of the two corpus halves — the vocabulary-drift
  *    number a corpus-refresh diff ships with.
  *  - `mm_audio_clipping`: clipped-sample ratio, peak, RMS and crest
  *    factor through the real RIFF/WAVE decode — the audio quality
  *    audit that catches hot-recorded or dead segments.
  */
object QRound9as extends QueryPack {

  // ---- ts_lttb_downsample ----

  private val lttbK = 24

  /** LTTB-style downsample of the hourly count series per event type:
    * each series is cut into k index buckets; an interior bucket keeps
    * the point with the largest triangle area against the MEAN points of
    * its neighbor buckets (the parallel variant of LTTB — the sequential
    * selected-point anchor is replaced by the bucket mean so every
    * bucket elects independently); the first/last buckets keep their
    * endpoints, as the paper does. The area comparison is exact: with
    * x = series index and y = hourly count, 2·A·np·nn =
    * |(Sxp·nn − Sxn·np)(y·np − Syp) − (Sxp − x·np)(Syp·nn − Syn·np)|
    * is pure BIGINT (ties broken by min x).
    *
    * Scale shape: windows partition by event_type (never global); the
    * per-bucket stats table is k rows per type and self-joins via
    * lag/lead; candidates join back on (type, bucket) — one shuffle
    * keyed by the series, election is per-bucket. */
  private[graft] def lttbDownsample(events: DataFrame): DataFrame = {
    val byType = Window.partitionBy("event_type")
    val wOrd = byType.orderBy("hr")
    val hourly = events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("c"))
      .withColumn("x", row_number().over(wOrd).cast(LongType) - 1)
      .withColumn("n_pts", count(lit(1)).over(byType))
    val pts = hourly.withColumn("bucket",
      floor(col("x") * lit(lttbK.toLong) / col("n_pts")).cast(LongType))
    val stats = pts.groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("nb"), sum("x").as("sx"), sum("c").as("sy"))
    val wB = Window.partitionBy("event_type").orderBy("bucket")
    val anchors = stats.select(col("event_type").as("a_type"), col("bucket").as("a_bucket"),
        lag("nb", 1).over(wB).as("np"),
        lag("sx", 1).over(wB).as("sxp"),
        lag("sy", 1).over(wB).as("syp"),
        lead("nb", 1).over(wB).as("nn"),
        lead("sx", 1).over(wB).as("sxn"),
        lead("sy", 1).over(wB).as("syn"))
    val cand = pts.join(anchors,
        col("event_type") === col("a_type") && col("bucket") === col("a_bucket"))
      .withColumn("score",
        abs((col("sxp") * col("nn") - col("sxn") * col("np")) *
            (col("c") * col("np") - col("syp")) -
          (col("sxp") - col("x") * col("np")) *
            (col("syp") * col("nn") - col("syn") * col("np"))))
      .withColumn("ord",
        when(col("np").isNull, col("x"))
          .when(col("nn").isNull, -col("x"))
          .otherwise(-col("score")))
    val wPick = Window.partitionBy("event_type", "bucket")
      .orderBy(col("ord"), col("x"))
    cand.withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("bucket"), col("x"), col("hr"), col("c"))
      .orderBy("event_type", "bucket")
  }

  private def tsLttbDownsample(s: SparkSession, d: String): DataFrame =
    lttbDownsample(t(s, d, "events"))

  private val oTsLttbDownsample =
    s"""WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS hr,
       |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
       |idx AS (SELECT event_type, hr, c,
       |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY hr)
       |      AS BIGINT) - 1 AS x,
       |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_pts
       |  FROM hourly),
       |pts AS (SELECT *, CAST(floor(x * $lttbK / n_pts) AS BIGINT) AS bucket
       |  FROM idx),
       |stats AS (SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS nb,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(c) AS BIGINT) AS sy
       |  FROM pts GROUP BY 1, 2),
       |anch AS (SELECT event_type AS a_type, bucket AS a_bucket,
       |    lag(nb) OVER w AS np, lag(sx) OVER w AS sxp, lag(sy) OVER w AS syp,
       |    lead(nb) OVER w AS nn, lead(sx) OVER w AS sxn, lead(sy) OVER w AS syn
       |  FROM stats WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
       |cand AS (SELECT p.event_type, p.bucket, p.x, p.hr, p.c,
       |    a.np, a.nn,
       |    abs((a.sxp * a.nn - a.sxn * a.np) * (p.c * a.np - a.syp)
       |      - (a.sxp - p.x * a.np) * (a.syp * a.nn - a.syn * a.np)) AS score
       |  FROM pts p JOIN anch a
       |    ON p.event_type = a.a_type AND p.bucket = a.a_bucket),
       |ranked AS (SELECT *, row_number() OVER (
       |    PARTITION BY event_type, bucket
       |    ORDER BY CASE WHEN np IS NULL THEN x
       |                  WHEN nn IS NULL THEN -x
       |                  ELSE -score END, x) AS rn
       |  FROM cand)
       |SELECT event_type, bucket, x, hr, c FROM ranked WHERE rn = 1
       |ORDER BY event_type, bucket""".stripMargin

  // ---- text_vocab_jsd ----

  /** Vocabulary drift between the two corpus halves (doc_id parity):
    * Jensen–Shannon divergence of the unigram distributions,
    * JSD = ½·Σ p·ln(p/m) + ½·Σ q·ln(q/m) with m = (p+q)/2 — symmetric,
    * bounded by ln 2, zero iff identical. Per-token contributions are
    * scale-to-long summed (1e12) so both engines add identical integers;
    * one trunc4 at the end (plus the bits normalization).
    *
    * Scale shape: token counts partial-aggregate map-side; the vocab
    * table shuffles once keyed by token; totals are a broadcast scalar
    * and the rollup is one row. */
  private[graft] def vocabJsd(docs: DataFrame): DataFrame = {
    val dd = DoubleType
    val toks = docs.select((col("doc_id") % 2).as("side"),
        explode(split(col("text"), " ")).as("tok"))
    val vocab = toks.groupBy("tok")
      .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("cb"))
    val tot = vocab.agg(sum("ca").as("ta"), sum("cb").as("tb"))
    val scored = vocab.crossJoin(broadcast(tot))
      .withColumn("p", col("ca").cast(dd) / col("ta").cast(dd))
      .withColumn("q", col("cb").cast(dd) / col("tb").cast(dd))
      .withColumn("m", (col("p") + col("q")) / lit(2.0))
      .withColumn("contrib",
        when(col("p") > 0, col("p") * log(col("p") / col("m"))).otherwise(lit(0.0)) +
        when(col("q") > 0, col("q") * log(col("q") / col("m"))).otherwise(lit(0.0)))
    scored.agg(
        count(lit(1)).as("n_vocab"),
        sum((col("ca") > 0 && col("cb") > 0).cast(LongType)).as("n_shared"),
        max("ta").as("tot_a"), max("tb").as("tot_b"),
        sum(floor(col("contrib") * lit(1e12) + lit(0.5))
          .cast(LongType)).as("s"))
      .select(col("n_vocab"), col("n_shared"), col("tot_a"), col("tot_b"),
        trunc4(col("s").cast(dd) / lit(2e12)).as("jsd_nats"),
        trunc4(col("s").cast(dd) / lit(2e12) / lit(0.6931471805599453))
          .as("jsd_bits"))
  }

  private def textVocabJsd(s: SparkSession, d: String): DataFrame =
    vocabJsd(t(s, d, "documents"))

  private val oTextVocabJsd =
    s"""WITH toks AS (SELECT doc_id % 2 AS side,
       |    unnest(string_split(text, ' ')) AS tok FROM documents),
       |vocab AS (SELECT tok,
       |    CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
       |    CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
       |  FROM toks GROUP BY tok),
       |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS ta,
       |    CAST(sum(cb) AS BIGINT) AS tb FROM vocab),
       |scored AS (SELECT v.ca, v.cb,
       |    CAST(v.ca AS DOUBLE) / t.ta AS p, CAST(v.cb AS DOUBLE) / t.tb AS q,
       |    (CAST(v.ca AS DOUBLE) / t.ta + CAST(v.cb AS DOUBLE) / t.tb) / 2e0 AS m,
       |    t.ta, t.tb
       |  FROM vocab v, tot t),
       |c AS (SELECT ca, cb, ta, tb,
       |    (CASE WHEN p > 0 THEN p * ln(p / m) ELSE 0e0 END +
       |     CASE WHEN q > 0 THEN q * ln(q / m) ELSE 0e0 END) AS contrib
       |  FROM scored)
       |SELECT CAST(count(*) AS BIGINT) AS n_vocab,
       |  CAST(sum(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_shared,
       |  max(ta) AS tot_a, max(tb) AS tot_b,
       |  ${oTrunc4("CAST(sum(CAST(floor(contrib * 1e12 + 5e-1) AS BIGINT)) AS DOUBLE) / 2e12")} AS jsd_nats,
       |  ${oTrunc4("CAST(sum(CAST(floor(contrib * 1e12 + 5e-1) AS BIGINT)) AS DOUBLE) / 2e12 / 6931471805599453e-16")} AS jsd_bits
       |FROM c""".stripMargin

  // ---- mm_audio_clipping ----

  private val clipThresh = 1000

  /** Audio clipping / dynamics audit through the real RIFF/WAVE decode:
    * per media the sample count, peak |s|, clipped-sample count
    * (|s| ≥ 1000 against the synthetic ±1024 rails), clip ratio, RMS
    * (from the exact integer sum of squares) and crest factor peak/RMS —
    * the hot-signal / dead-signal screen. The oracle replays the sample
    * synthesis formula per index, so a header or byte-order bug breaks
    * the hash.
    *
    * Scale shape: per-partition batch decode (the mm family shape); only
    * the 4-column per-media rollup shuffles. */
  private[graft] def audioClipping(media: org.apache.spark.sql.Dataset[
      Multimodal.MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    val dd = DoubleType
    media.mapPartitions(_.flatMap { r =>
      Multimodal.decodeWavSamples(r.payload).map { s =>
        var peak = 0L; var clip = 0L; var ss = 0L
        var i = 0
        while (i < s.length) {
          val v = s(i).toLong
          val a = math.abs(v)
          if (a > peak) peak = a
          if (a >= clipThresh) clip += 1
          ss += v * v
          i += 1
        }
        (r.media_id, s.length.toLong, peak, clip, ss)
      }
    }).toDF("media_id", "n_samples", "peak", "n_clipped", "ss")
      .select(col("media_id"), col("n_samples"), col("peak"), col("n_clipped"),
        trunc4(col("n_clipped").cast(dd) / col("n_samples").cast(dd))
          .as("clip_ratio"),
        trunc4(sqrt(col("ss").cast(dd) / col("n_samples").cast(dd)))
          .as("rms"),
        trunc4(col("peak").cast(dd) /
          sqrt(col("ss").cast(dd) / col("n_samples").cast(dd))).as("crest"))
      .orderBy("media_id")
  }

  private def mmAudioClipping(s: SparkSession, d: String): DataFrame =
    audioClipping(Multimodal.audioFromDocuments(s, d))

  private val oMmAudioClipping =
    s"""WITH d AS (SELECT doc_id, CAST(64 + doc_id % 64 AS BIGINT) AS n
       |  FROM documents),
       |sm AS (SELECT doc_id, n,
       |    (doc_id * 37 + i.i * 11) % 2048 - 1024 AS s
       |  FROM d, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i) i),
       |a AS (SELECT doc_id, n, CAST(max(abs(s)) AS BIGINT) AS peak,
       |    CAST(sum(CASE WHEN abs(s) >= $clipThresh THEN 1 ELSE 0 END)
       |      AS BIGINT) AS clip,
       |    CAST(sum(s * s) AS BIGINT) AS ss
       |  FROM sm GROUP BY doc_id, n)
       |SELECT doc_id AS media_id, n AS n_samples, peak, clip AS n_clipped,
       |  ${oTrunc4("CAST(clip AS DOUBLE) / n")} AS clip_ratio,
       |  ${oTrunc4("sqrt(CAST(ss AS DOUBLE) / n)")} AS rms,
       |  ${oTrunc4("CAST(peak AS DOUBLE) / sqrt(CAST(ss AS DOUBLE) / n)")} AS crest
       |FROM a ORDER BY media_id""".stripMargin

  val queries: Map[String, QFn] = Map(
    "ts_lttb_downsample" -> tsLttbDownsample _,
    "text_vocab_jsd"     -> textVocabJsd _,
    "mm_audio_clipping"  -> mmAudioClipping _)

  val oracles: Map[String, String] = Map(
    "ts_lttb_downsample" -> oTsLttbDownsample,
    "text_vocab_jsd"     -> oTextVocabJsd,
    "mm_audio_clipping"  -> oMmAudioClipping)
}
