package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 28 (SURVEY §2.28):
  *
  *  - `ts_rolling_wau`: trailing-7-day distinct active users per day —
  *    the product-analytics WAU curve, spelled scalably (no distinct
  *    inside a window, which Spark doesn't have and a 100 TB engine
  *    shouldn't want).
  *  - `text_sentence_stats`: sentence segmentation + per-doc sentence
  *    statistics — the preprocessing profile before chunking.
  *  - `fn_stable_id`: deterministic content-derived document identity
  *    (md5 of source|text) — keyless ingestion's stable primary key.
  */
object QRound9ac extends QueryPack {

  private val wauWin = 7

  /** Trailing-7-day distinct active users per calendar day: each
    * (day, user) activity row CONTRIBUTES to the 7 target days
    * [day, day+6] — an explode with factor 7 on uniform keys — and the
    * per-target-day distinct count is one aggregate. This replaces the
    * unimplementable `count(DISTINCT) OVER (RANGE 7)` AND the
    * days×users range join with a map-side explode whose cost is
    * exactly 7× the distinct activity table, independent of window
    * placement. Target days past the observed maximum are clipped, so
    * every emitted day has a full look-back only if the data covers it
    * (leading ramp-up days are real WAU semantics).
    *
    * Scale shape: distinct (day, user) is one uniform-key aggregate;
    * the ×7 explode is map-side; the final count is a day-keyed
    * aggregate; the max-day scalar broadcasts. */
  private[graft] def rollingWau(events: DataFrame): DataFrame = {
    val du = events
      .select(expr(
        "unix_micros(cast(date_trunc('DAY', ts) as timestamp)) div 86400000000")
        .as("day_num"), col("user_id"))
      .distinct()
    val mx = du.agg(max(col("day_num")).as("mx"))
    du.crossJoin(broadcast(mx))
      .select(col("user_id"), col("day_num"), col("mx"),
        explode(sequence(col("day_num"),
          least(col("day_num") + lit(wauWin - 1), col("mx")))).as("d"))
      .select(col("d"), col("user_id")).distinct()
      .groupBy("d").agg(count(lit(1)).as("wau"))
      .select(col("d").as("day_num"), col("wau"))
      .orderBy("day_num")
  }

  private def tsRollingWau(s: SparkSession, d: String): DataFrame =
    rollingWau(t(s, d, "events"))

  private val oTsRollingWau =
    s"""WITH du AS (SELECT DISTINCT
       |    epoch_us(date_trunc('day', ts)) // 86400000000 AS day_num,
       |    user_id
       |  FROM events),
       |mx AS (SELECT max(day_num) AS mx FROM du),
       |ex AS (SELECT DISTINCT d.d, du.user_id
       |  FROM du, mx, LATERAL (SELECT unnest(generate_series(du.day_num,
       |    least(du.day_num + ${wauWin - 1}, mx.mx))) AS d) d)
       |SELECT d AS day_num, CAST(count(*) AS BIGINT) AS wau
       |FROM ex GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- text_sentence_stats ----

  /** Sentence segmentation profile per document: split on [.!?]+
    * followed by whitespace (trailing terminator tolerated), count
    * sentences, mean sentence length in words (exact longs, one trunc4
    * division), and the longest sentence's word count — the chunking
    * pre-flight profile.
    *
    * Scale shape: map-side split + one doc-keyed aggregate over the
    * exploded sentences. */
  private[graft] def sentenceStats(docs: DataFrame): DataFrame = {
    val dd = DoubleType
    docs
      .select(col("doc_id"),
        explode(split(col("text"), "[.!?]+\\s+|[.!?]+$")).as("sent"))
      .filter(trim(col("sent")) =!= "")
      .select(col("doc_id"),
        size(split(trim(col("sent")), "\\s+")).cast(LongType).as("wc"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sents"), sum(col("wc")).as("n_words"),
        max(col("wc")).as("max_sent_words"))
      .select(col("doc_id"), col("n_sents"), col("n_words"),
        col("max_sent_words"),
        trunc4(col("n_words").cast(dd) / col("n_sents").cast(dd))
          .as("mean_sent_words"))
      .orderBy("doc_id")
  }

  private def textSentenceStats(s: SparkSession, d: String): DataFrame =
    sentenceStats(t(s, d, "documents"))

  private val oTextSentenceStats =
    s"""WITH s AS (SELECT doc_id,
       |    unnest(regexp_split_to_array(text, '[.!?]+\\s+|[.!?]+$$')) AS sent
       |  FROM documents),
       |w AS (SELECT doc_id,
       |    CAST(len(regexp_split_to_array(trim(sent), '\\s+')) AS BIGINT) AS wc
       |  FROM s WHERE trim(sent) <> ''),
       |g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sents,
       |    CAST(sum(wc) AS BIGINT) AS n_words,
       |    CAST(max(wc) AS BIGINT) AS max_sent_words
       |  FROM w GROUP BY 1)
       |SELECT doc_id, n_sents, n_words, max_sent_words,
       |  ${oTrunc4("CAST(n_words AS DOUBLE) / CAST(n_sents AS DOUBLE)")}
       |    AS mean_sent_words
       |FROM g ORDER BY doc_id""".stripMargin

  // ---- fn_stable_id ----

  /** Content-derived stable identity: md5(source|text) formatted as a
    * canonical 8-4-4-4-12 UUID string — the deterministic primary key a
    * keyless ingestion pipeline mints so re-crawls converge on the same
    * id (UUIDv3's shape with an explicit portable hash). Emits the id,
    * its collision-group size (1 everywhere unless content truly
    * repeats), and a per-source distinct-id rollup row sample.
    *
    * Scale shape: map-side hash; one uniform-key aggregate for the
    * collision audit. */
  private[graft] def stableId(docs: DataFrame): DataFrame = {
    val h = md5(concat_ws("|", col("source"), col("text")))
    val ids = docs.select(col("doc_id"), col("source"),
      concat_ws("-",
        substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
        substring(h, 17, 4), substring(h, 21, 12)).as("stable_id"))
    val grp = ids.groupBy("stable_id").agg(count(lit(1)).as("n_dup"))
    ids.join(grp, "stable_id")
      .select(col("doc_id"), col("source"), col("stable_id"), col("n_dup"))
      .orderBy("doc_id")
  }

  private def fnStableId(s: SparkSession, d: String): DataFrame =
    stableId(t(s, d, "documents"))

  private val oFnStableId =
    """WITH ids AS (SELECT doc_id, source,
      |    concat_ws('-',
      |      substr(md5(source || '|' || text), 1, 8),
      |      substr(md5(source || '|' || text), 9, 4),
      |      substr(md5(source || '|' || text), 13, 4),
      |      substr(md5(source || '|' || text), 17, 4),
      |      substr(md5(source || '|' || text), 21, 12)) AS stable_id
      |  FROM documents),
      |grp AS (SELECT stable_id, CAST(count(*) AS BIGINT) AS n_dup
      |  FROM ids GROUP BY 1)
      |SELECT i.doc_id, i.source, i.stable_id, g.n_dup
      |FROM ids i JOIN grp g ON g.stable_id = i.stable_id
      |ORDER BY i.doc_id""".stripMargin

  val queries: Map[String, QFn] = Map(
    "ts_rolling_wau"      -> tsRollingWau _,
    "text_sentence_stats" -> textSentenceStats _,
    "fn_stable_id"        -> fnStableId _)

  val oracles: Map[String, String] = Map(
    "ts_rolling_wau"      -> oTsRollingWau,
    "text_sentence_stats" -> oTextSentenceStats,
    "fn_stable_id"        -> oFnStableId)
}
