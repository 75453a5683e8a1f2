package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 63 (SURVEY §2.28):
  *
  *  - `sim_margin_stats`: retrieval-confidence margins — the top1−top2
  *    score gap per query over the shared brute-force top-k, with the
  *    ambiguous-query count; the signal that routes low-margin queries
  *    to a re-ranker.
  *  - `mm_av_duration_check`: audio/video duration cross-check per
  *    document — samples-per-frame consistency through BOTH real
  *    decoders; the A/V sync audit of a multimodal lake.
  *  - `dedup_impact_report`: corpus impact of exact dedup by language —
  *    documents/tokens/bytes removed; the before/after accounting a
  *    curation run publishes.
  */
object QRound9bl extends QueryPack {

  // ---- sim_margin_stats ----

  private val marginTau = 2e-2

  /** Margin analysis over the memoized top-k: per probe query the gap
    * between the best and second-best non-self trunc4'd scores; the
    * rollup reports mean/min margins (scale-to-long mean) and how many
    * queries fall under the τ=0.02 ambiguity cut (trunc'd-vs-literal).
    *
    * Scale shape: one pass over the bounded top-k table; a 20-row
    * pivot; one summary row. */
  private[graft] def marginStats(s: SparkSession, d: String): DataFrame = {
    val dd = DoubleType
    val top = QSim.simCosineTopk(s, d)
      .filter(col("vec_id") =!= col("qid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy("rnk")
    val firstTwo = top.withColumn("rnk2", row_number().over(w))
      .filter(col("rnk2") <= 2)
    val margins = firstTwo.groupBy("qid")
      .agg(max(when(col("rnk2") === 1, col("score"))).as("s1"),
        max(when(col("rnk2") === 2, col("score"))).as("s2"))
      .withColumn("margin", col("s1") - col("s2"))
    margins.agg(count(lit(1)).as("n_queries"),
        sum(floor(col("margin") * lit(1e12) + lit(0.5)).cast(LongType))
          .as("sm"),
        min("margin").as("min_m"),
        sum((col("margin") < lit(marginTau)).cast(LongType))
          .as("n_ambiguous"))
      .select(col("n_queries"),
        trunc4(col("sm").cast(dd) / lit(1e12) / col("n_queries").cast(dd))
          .as("mean_margin"),
        trunc4(col("min_m")).as("min_margin"),
        col("n_ambiguous"))
  }

  private val oSimMarginStats =
    s"""WITH top AS (SELECT * FROM (${QSim.oracles("sim_cosine_topk")}) t
       |  WHERE t.vec_id <> t.qid),
       |ft AS (SELECT qid, score, row_number() OVER (PARTITION BY qid
       |    ORDER BY rnk) AS rnk2 FROM top QUALIFY rnk2 <= 2),
       |mg AS (SELECT qid,
       |    max(CASE WHEN rnk2 = 1 THEN score END)
       |      - max(CASE WHEN rnk2 = 2 THEN score END) AS margin
       |  FROM ft GROUP BY 1)
       |SELECT CAST(count(*) AS BIGINT) AS n_queries,
       |  ${oTrunc4("CAST(sum(CAST(floor(margin * 1e12 + 5e-1) AS BIGINT)) AS DOUBLE) / 1e12 / count(*)")} AS mean_margin,
       |  ${oTrunc4("min(margin)")} AS min_margin,
       |  CAST(sum(CASE WHEN margin < 2e-2 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_ambiguous
       |FROM mg""".stripMargin

  // ---- mm_av_duration_check ----

  /** A/V consistency: per document the video frame count (multi-frame
    * P6 decode) joined with the audio sample count (RIFF/WAVE decode);
    * samples-per-frame = n_samples div n_frames must land in the sane
    * [12, 64] band for this lake's synthesis — out-of-band rows flag.
    * The oracle replays both synthesis cardinalities analytically.
    *
    * Scale shape: two per-partition batch decodes joined on the doc
    * key; per-doc rollups only. */
  private[graft] def avDurationCheck(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val frames = Multimodal.videosFromDocuments(s, d)
      .mapPartitions(_.map(r =>
        (r.media_id, Multimodal.decodeFrames(r.payload).size.toLong)))
      .toDF("media_id", "n_frames")
    val samples = Multimodal.audioFromDocuments(s, d)
      .mapPartitions(_.flatMap(r =>
        Multimodal.decodeWavSamples(r.payload)
          .map(a => (r.media_id, a.length.toLong))))
      .toDF("media_id", "n_samples")
    frames.join(samples, "media_id")
      .withColumn("samples_per_frame",
        expr("n_samples div n_frames"))
      .withColumn("sync_ok",
        (col("samples_per_frame") >= 12 && col("samples_per_frame") <= 64)
          .cast(IntegerType))
      .orderBy("media_id")
  }

  private val oMmAvDurationCheck =
    s"""WITH d AS (SELECT doc_id, CAST(2 + doc_id % 4 AS BIGINT)
       |    AS n_frames,
       |    CAST(64 + doc_id % 64 AS BIGINT) AS n_samples
       |  FROM documents)
       |SELECT doc_id AS media_id, n_frames, n_samples,
       |  n_samples // n_frames AS samples_per_frame,
       |  CASE WHEN n_samples // n_frames BETWEEN 12 AND 64
       |    THEN 1 ELSE 0 END AS sync_ok
       |FROM d ORDER BY media_id""".stripMargin

  // ---- dedup_impact_report ----

  /** Dedup impact accounting by language: exact-md5 text dedup keeps
    * the min-id document per digest; the report compares documents,
    * whitespace tokens and characters before/after, with the removal
    * share — the headline a curation run publishes. All counts exact.
    *
    * Scale shape: one digest groupBy (uniform md5 keys) and two
    * per-lang rollups. */
  private[graft] def dedupImpactReport(docs: DataFrame): DataFrame = {
    val dd = DoubleType
    val base = docs.select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast(LongType).as("n_toks"),
      col("n_chars").cast(LongType).as("n_chars"),
      md5(col("text").cast(BinaryType)).as("h"))
    val keep = base.groupBy("h").agg(min("doc_id").as("doc_id"))
    val before = base.groupBy("lang")
      .agg(count(lit(1)).as("docs_before"),
        sum("n_toks").as("toks_before"), sum("n_chars").as("chars_before"))
    val after = base.join(keep, Seq("h", "doc_id"))
      .groupBy("lang")
      .agg(count(lit(1)).as("docs_after"),
        sum("n_toks").as("toks_after"), sum("n_chars").as("chars_after"))
    before.join(after, "lang")
      .select(col("lang"), col("docs_before"), col("docs_after"),
        col("toks_before"), col("toks_after"),
        trunc4((col("chars_before") - col("chars_after")).cast(dd) /
          col("chars_before").cast(dd)).as("chars_removed_share"))
      .orderBy("lang")
  }

  private def dedupImpact(s: SparkSession, d: String): DataFrame =
    dedupImpactReport(t(s, d, "documents"))

  private val oDedupImpactReport =
    s"""WITH base AS (SELECT doc_id, lang,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
       |    CAST(n_chars AS BIGINT) AS n_chars, md5(text) AS h
       |  FROM documents),
       |keep AS (SELECT h, min(doc_id) AS doc_id FROM base GROUP BY 1),
       |before_t AS (SELECT lang, CAST(count(*) AS BIGINT) AS docs_before,
       |    CAST(sum(n_toks) AS BIGINT) AS toks_before,
       |    CAST(sum(n_chars) AS BIGINT) AS chars_before
       |  FROM base GROUP BY 1),
       |after_t AS (SELECT b.lang, CAST(count(*) AS BIGINT) AS docs_after,
       |    CAST(sum(b.n_toks) AS BIGINT) AS toks_after,
       |    CAST(sum(b.n_chars) AS BIGINT) AS chars_after
       |  FROM base b JOIN keep k ON k.h = b.h AND k.doc_id = b.doc_id
       |  GROUP BY 1)
       |SELECT b.lang, b.docs_before, a.docs_after, b.toks_before,
       |  a.toks_after,
       |  ${oTrunc4("CAST(b.chars_before - a.chars_after AS DOUBLE) / b.chars_before")} AS chars_removed_share
       |FROM before_t b JOIN after_t a ON a.lang = b.lang
       |ORDER BY b.lang""".stripMargin

  val queries: Map[String, QFn] = Map(
    "sim_margin_stats"     -> ((s, d) => marginStats(s, d)),
    "mm_av_duration_check" -> ((s, d) => avDurationCheck(s, d)),
    "dedup_impact_report"  -> dedupImpact _)

  val oracles: Map[String, String] = Map(
    "sim_margin_stats"     -> oSimMarginStats,
    "mm_av_duration_check" -> oMmAvDurationCheck,
    "dedup_impact_report"  -> oDedupImpactReport)
}
