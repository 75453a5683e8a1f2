package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 8 (SURVEY §2.27):
  *
  *  - `join_interval_overlap`: true range×range overlap join (activity
  *    intervals × campaign windows) via bucket decomposition — the
  *    missing interval-algebra shape beside the point-in-interval and
  *    as-of families.
  *  - `win_cumulative_distinct`: running COUNT(DISTINCT) per user — a
  *    window SQL cannot express directly (no DISTINCT window aggregate
  *    in either engine); the first-occurrence-flag + running-sum rewrite
  *    IS the operator.
  *  - `stream_file_source`: file-source streaming ingestion (the
  *    directory-watch path a landing zone uses); batch twin declared,
  *    Round9iSpec proves readStream over the staged files reaches the
  *    identical aggregate.
  */
object QRound9i extends QueryPack {

  // ---- join_interval_overlap ----

  private val ovCampaigns = 20

  /** Range×range overlap join: per-(user, day) activity intervals
    * [first event, last event] against `ovCampaigns` synthetic 12-hour
    * campaign windows laid every 36 hours from the corpus start (both
    * engines derive them from the same min-timestamp, so the fixture is
    * data-deterministic). Each interval explodes to the 12-hour buckets
    * it touches; candidates equi-join on the bucket; a pair that spans
    * several shared buckets is deduped before the EXACT overlap filter
    * (a.s < b.e ∧ b.s < a.e) and the exact overlap sum
    * (min(end)−max(start), pure micros).
    *
    * Scale shape: bucket decomposition turns the classic O(N·M) range
    * join into an equi-join whose fan-out is interval-length/bucket-size
    * (≤ 2 buckets for a ≤ 1-day activity interval, 2 for a 12 h window)
    * — the `join_interval_bucket` trick generalized to two interval
    * sides; the 20-row campaign side broadcasts. */
  private[graft] def intervalOverlap(events: DataFrame): DataFrame = {
    val bucketUs = 43200000000L // 12h
    val e = events.select(col("user_id"),
      expr("unix_micros(cast(ts as timestamp))").as("us"))
    val sessions = e
      .withColumn("day", expr(s"us div 86400000000"))
      .groupBy("user_id", "day")
      .agg(min(col("us")).as("a_s"), max(col("us")).as("a_e"))
    val base = e.agg(expr("min(us) div 86400000000 * 86400000000").as("b0"))
    val camp = base.select(col("b0"),
        explode(sequence(lit(0L), lit((ovCampaigns - 1).toLong))).as("campaign"))
      .select(col("campaign"),
        (col("b0") + col("campaign") * lit(129600000000L)).as("b_s"))
      .withColumn("b_e", col("b_s") + lit(bucketUs))
    val sB = sessions.withColumn("bkt",
      explode(sequence(expr(s"a_s div $bucketUs"), expr(s"a_e div $bucketUs"))))
    val cB = camp.withColumn("bkt",
      explode(sequence(expr(s"b_s div $bucketUs"),
        expr(s"(b_e - 1) div $bucketUs"))))
    sB.join(broadcast(cB), "bkt")
      .filter(col("a_s") < col("b_e") && col("b_s") < col("a_e"))
      .select("user_id", "day", "campaign", "a_s", "a_e", "b_s", "b_e")
      .distinct() // a pair can meet in several shared buckets
      .groupBy("campaign")
      .agg(count(lit(1)).as("n_sessions"),
        sum(least(col("a_e"), col("b_e")) - greatest(col("a_s"), col("b_s")))
          .as("overlap_us"))
      .orderBy("campaign")
  }

  private def joinIntervalOverlap(s: SparkSession, d: String): DataFrame =
    intervalOverlap(t(s, d, "events"))

  private val oJoinIntervalOverlap =
    s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
       |sessions AS (SELECT user_id, us // 86400000000 AS day,
       |    min(us) AS a_s, max(us) AS a_e FROM e GROUP BY 1, 2),
       |base AS (SELECT min(us) // 86400000000 * 86400000000 AS b0 FROM e),
       |camp AS (SELECT c.campaign, base.b0 + c.campaign * 129600000000 AS b_s,
       |    base.b0 + c.campaign * 129600000000 + 43200000000 AS b_e
       |  FROM base, (SELECT unnest(generate_series(0, ${ovCampaigns - 1}))
       |    AS campaign) c),
       |pairs AS (SELECT DISTINCT s.user_id, s.day, c.campaign,
       |    s.a_s, s.a_e, c.b_s, c.b_e
       |  FROM sessions s JOIN camp c
       |    ON s.a_s < c.b_e AND c.b_s < s.a_e)
       |SELECT campaign, count(*) AS n_sessions,
       |  CAST(sum(least(a_e, b_e) - greatest(a_s, b_s)) AS BIGINT)
       |    AS overlap_us
       |FROM pairs GROUP BY campaign ORDER BY campaign""".stripMargin

  // ---- win_cumulative_distinct ----

  /** Running COUNT(DISTINCT event_type) per user — the "how much of the
    * product has this user touched by now" curve. Neither engine has a
    * DISTINCT window aggregate, so the operator IS the rewrite: flag
    * each (user, type)'s first occurrence with one ranking window, then
    * running-sum the flags with a second — two partitioned window
    * passes, both on the user key, no self-join and no state blowup
    * (the flag is 0/1, the running sum is monotone). */
  private[graft] def cumulativeDistinct(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"), col("event_id"),
      expr("unix_micros(cast(ts as timestamp))").as("us"), col("event_type"))
    val wFirst = Window.partitionBy("user_id", "event_type")
      .orderBy("us", "event_id")
    val wRun = Window.partitionBy("user_id").orderBy("us", "event_id")
    e.withColumn("first_seen",
        when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
      .withColumn("n_types_seen", sum(col("first_seen")).over(wRun))
      .select("event_id", "user_id", "n_types_seen")
      .orderBy("event_id")
  }

  private def winCumulativeDistinct(s: SparkSession, d: String): DataFrame =
    cumulativeDistinct(t(s, d, "events"))

  private val oWinCumulativeDistinct =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
      |  FROM events),
      |f AS (SELECT user_id, event_id, us,
      |    CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
      |      ORDER BY us, event_id) = 1 THEN 1 ELSE 0 END AS first_seen
      |  FROM e)
      |SELECT event_id, user_id,
      |  CAST(sum(first_seen) OVER (PARTITION BY user_id
      |    ORDER BY us, event_id) AS BIGINT) AS n_types_seen
      |FROM f ORDER BY event_id""".stripMargin

  // ---- stream_file_source ----

  /** File-source ingestion: the events table staged as a parquet
    * directory (the landing-zone layout), aggregated per event type.
    * Declared as the batch read of the staged directory; Round9iSpec
    * runs the SAME directory through `readStream` (maxFilesPerTrigger=1,
    * so the stream sees multiple micro-batches) and proves the
    * complete-mode aggregate is identical — the directory-watch
    * ingestion path a streaming lakehouse uses. */
  private[graft] def fileSourceAgg(df: DataFrame): DataFrame =
    df.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum4(col("value")).as("sum_value"))
      .orderBy("event_type")

  private[graft] def stagedEventsDir(s: SparkSession, d: String): String =
    QRound3.staged(s, d, "evstream") { dir =>
      // 4 files so the streaming twin gets several micro-batches
      t(s, d, "events").repartition(4).write.mode("overwrite").parquet(dir)
    }

  private def streamFileSource(s: SparkSession, d: String): DataFrame =
    fileSourceAgg(s.read.parquet(stagedEventsDir(s, d)))

  private val oStreamFileSource =
    s"""SELECT event_type, count(*) AS n, ${oSum4("value")} AS sum_value
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, QFn] = Map(
    "join_interval_overlap"   -> joinIntervalOverlap _,
    "win_cumulative_distinct" -> winCumulativeDistinct _,
    "stream_file_source"      -> streamFileSource _)

  val oracles: Map[String, String] = Map(
    "join_interval_overlap"   -> oJoinIntervalOverlap,
    "win_cumulative_distinct" -> oWinCumulativeDistinct,
    "stream_file_source"      -> oStreamFileSource)
}
