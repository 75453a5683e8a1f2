package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 7 (SURVEY §2.27):
  *
  *  - `serve_mget_bucketed`: batch point-lookup (mget) against the
  *    bucketed score store, with explicit missing-key semantics — the
  *    online-serving read path beside the single-key lookup.
  *  - `ds_typed_funnel`: typed `Dataset` per-user funnel via
  *    `groupByKey.mapGroups` — imperative per-group logic through the
  *    Encoder path (the case where expression DSL gets clumsy), with the
  *    window-SQL twin as the oracle.
  *  - `stream_upsert_sink`: per-user latest-state upsert (the online
  *    feature-store sink); batch twin declared + Round9hSpec proves a
  *    chunked foreachBatch upsert replay converges to the same store.
  */
object QRound9h extends QueryPack {

  // ---- serve_mget_bucketed ----

  private val mgetN = 100

  /** mget: 100 requested user ids (2, 4, …, 200 — half miss beyond the
    * corpus's 150 users at sf0.01) against the memoized BUCKETED score
    * store (`servetbl` — shared with `serve_point_lookup`). Found rows
    * come from a left-semi broadcast of the request set into the
    * bucketed scan; misses from the anti side; both emit through one
    * union with an explicit `found` flag and −1 sentinels — the batch
    * read API an online store exposes. The store never shuffles: both
    * probes are broadcast of the 100-row request list. */
  private def serveMgetBucketed(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tbl = QRound5.serveTablePersisted(s, d)
    val keys = (1 to mgetN).map(_ * 2L).toDF("user_id")
    val found = tbl.join(broadcast(keys), Seq("user_id"), "left_semi")
      .select(col("user_id"), col("score"), col("decile"),
        lit(true).as("found"))
    val missing = keys.join(tbl.select("user_id"), Seq("user_id"), "left_anti")
      .select(col("user_id"), lit(-1.0).as("score"),
        lit(-1).cast(IntegerType).as("decile"), lit(false).as("found"))
    found.unionByName(missing).orderBy("user_id")
  }

  private val oServeMgetBucketed = {
    val oScores = QPipeline.oracles("chp_score_linear")
    s"""WITH sc AS MATERIALIZED (SELECT * FROM ($oScores)),
       |keys AS (SELECT unnest(generate_series(1, $mgetN)) * 2 AS user_id)
       |SELECT k.user_id,
       |  coalesce(sc.score, -1.0) AS score,
       |  CAST(coalesce(sc.decile, -1) AS INT) AS decile,
       |  sc.user_id IS NOT NULL AS found
       |FROM keys k LEFT JOIN sc ON sc.user_id = k.user_id
       |ORDER BY k.user_id""".stripMargin
  }

  // ---- ds_typed_funnel ----

  case class FEv(user_id: Long, event_id: Long, us: Long, et: String)

  /** Typed per-user funnel through `groupByKey.mapGroups`: sort the
    * user's events in memory, walk once for the first click and the
    * first purchase strictly after it — the imperative spelling the
    * typed Dataset API exists for (the window twin needs two frames and
    * a conditional join; here it is ten lines of Scala against
    * case-class rows). Per-user event lists are session-scale (bounded
    * by one user's activity), so the in-group sort is safe at any corpus
    * size; groups shuffle once on the user key. Oracle = the window-SQL
    * twin, so the two spellings are proven equivalent cross-engine. */
  private[graft] def typedFunnel(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val ds = events.select(col("user_id"), col("event_id"),
      expr("unix_micros(cast(ts as timestamp))").as("us"),
      col("event_type").as("et")).as[FEv]
    ds.groupByKey(_.user_id)
      .mapGroups { (uid, it) =>
        val evs = it.toArray.sortBy(e => (e.us, e.event_id))
        val n = evs.length
        val firstClick = evs.find(_.et == "click")
        val conv = firstClick.flatMap(c =>
          evs.find(e => e.et == "purchase" && e.us > c.us))
        val lag = (for (c <- firstClick; p <- conv) yield p.us - c.us)
        (uid, n.toLong, conv.isDefined,
          lag.getOrElse(-1L))
      }
      .toDF("user_id", "n_events", "converted", "us_to_convert")
      .orderBy("user_id")
  }

  private def dsTypedFunnel(s: SparkSession, d: String): DataFrame =
    typedFunnel(t(s, d, "events"))

  private val oDsTypedFunnel =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
      |  FROM events),
      |fc AS (SELECT user_id, min(us) AS click_us FROM e
      |  WHERE event_type = 'click' GROUP BY 1),
      |fp AS (SELECT e.user_id, min(e.us) AS purch_us
      |  FROM e JOIN fc ON fc.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND e.us > fc.click_us
      |  GROUP BY 1),
      |n AS (SELECT user_id, count(*) AS n_events FROM e GROUP BY 1)
      |SELECT n.user_id, n.n_events,
      |  fp.user_id IS NOT NULL AS converted,
      |  coalesce(fp.purch_us - fc.click_us, -1) AS us_to_convert
      |FROM n LEFT JOIN fc ON fc.user_id = n.user_id
      |  LEFT JOIN fp ON fp.user_id = n.user_id
      |ORDER BY n.user_id""".stripMargin

  // ---- stream_upsert_sink ----

  /** Per-user latest-state store (the online feature-store sink): after
    * applying every event as an upsert in (ts, event_id) order, the
    * store holds each user's last event id/type/value. Declared as the
    * batch twin (one user-partitioned ranking window); Round9hSpec
    * replays the SAME events through a chunked foreachBatch upsert loop
    * (the streaming write path) and proves the final store is identical
    * — the idempotent-upsert convergence a streaming sink must have. */
  private[graft] def upsertSinkState(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("us").desc, col("event_id").desc)
    events.select(col("user_id"), col("event_id"),
      expr("unix_micros(cast(ts as timestamp))").as("us"),
      col("event_type"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"), col("value").as("last_value"),
        col("us").as("last_us"))
      .orderBy("user_id")
  }

  private def streamUpsertSink(s: SparkSession, d: String): DataFrame =
    upsertSinkState(t(s, d, "events"))

  private val oStreamUpsertSink =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
      |    value, row_number() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      |  FROM events)
      |SELECT user_id, event_id AS last_event_id, event_type AS last_type,
      |  value AS last_value, us AS last_us
      |FROM e WHERE rn = 1 ORDER BY user_id""".stripMargin

  val queries: Map[String, QFn] = Map(
    "serve_mget_bucketed" -> serveMgetBucketed _,
    "ds_typed_funnel"     -> dsTypedFunnel _,
    "stream_upsert_sink"  -> streamUpsertSink _)

  val oracles: Map[String, String] = Map(
    "serve_mget_bucketed" -> oServeMgetBucketed,
    "ds_typed_funnel"     -> oDsTypedFunnel,
    "stream_upsert_sink"  -> oStreamUpsertSink)
}
