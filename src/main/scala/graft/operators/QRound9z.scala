package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 25 (SURVEY §2.28):
  *
  *  - `agg_weighted_median`: exact weighted median (smallest value whose
  *    cumulative weight reaches half the total) — the robust center the
  *    plain median can't give when rows carry unequal mass.
  *  - `upsert_schema_evolve`: latest-wins merge where the delta batch
  *    carries a NEW column the base never had — the schema-evolution
  *    upsert every long-lived lake table eventually needs.
  *  - `mm_audio_pitch`: dominant-periodicity estimate via exact
  *    mean-centered autocorrelation argmax over the decoded WAV samples
  *    — the classic ACF pitch detector beside energy/ZCR.
  */
object QRound9z extends QueryPack {

  // ---- agg_weighted_median ----

  /** Weighted median of the lineitem price (cents) weighted by quantity,
    * per return flag: the smallest price p with 2·cumw(p) ≥ totw — all
    * cumulative weights exact BIGINTs, so the pick cannot drift. Also
    * reports the total weight and the share of weight at or below the
    * median (trunc6).
    *
    * Two-phase bucketed exact median (the classic distributed shape).
    * The previous spelling ran a per-flag cumulative window over the
    * distinct (flag, cents) table — but cents are nearly UNIQUE (594k of
    * 600k rows at sf0.1), so that table is row-scale and the window runs
    * one task per flag: a genuine scale-killer, and locally ~4.7× the
    * oracle (VERDICT r12 #1d). Instead:
    *  1. coarse pass: per (flag, cents DIV 2^14 bucket) weight sums —
    *     map-side combinable to ~700 buckets/flag, so the shuffle is
    *     tiny no matter the row count; the bucket histogram is DOMAIN-
    *     bounded (price range ÷ 2^14 × #flags, never row-scale), so the
    *     median bucket + its preceding cumulative weight are resolved
    *     driver-side from the collected histogram (the bounded-collect
    *     discipline: loud `require` on the size);
    *  2. fine pass: filter to each flag's median bucket with a LITERAL
    *     predicate (no join needed — the driver already knows the 3
    *     bucket ids) and aggregate exact per-cents weights there. That
    *     table is ALSO domain-bounded (≤ 2^14 distinct cents per flag by
    *     construction), so the crossing cents + share_at finish driver-
    *     side. The median is guaranteed inside that bucket because the
    *     bucket-level cumulative first crosses totw/2 in it.
    * Two scans of the row-scale input (locally cheaper than caching it:
    * the cache build costs more than the re-read at this width; on a
    * cluster `base` would be persisted across the passes); both
    * aggregates are full-parallel with bounded outputs; nothing
    * row-scale is collected, checkpointed, or single-tasked. */
  private[graft] def weightedMedian(li: DataFrame): DataFrame = {
    val bw = 16384L
    val spark = li.sparkSession
    val base = li.select(col("l_returnflag").as("flag"),
      floor(col("l_extendedprice") * lit(1e2) + lit(5e-1)).cast(LongType)
        .as("cents"),
      col("l_quantity").cast(LongType).as("w"))
    val bktRows = base.groupBy(col("flag"), expr(s"cents DIV $bw").as("b"))
        .agg(sum(col("w")).as("bsum")).collect()
    require(bktRows.length <= 500000,
        s"weightedMedian bucket histogram unexpectedly row-scale: " +
          s"${bktRows.length} buckets — widen bw before trusting this collect")
    val med = bktRows.toSeq.groupBy(_.getString(0)).toSeq.map {
        case (f, rows) =>
          val sorted = rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
          val tot = sorted.iterator.map(_._2).sum
          var cum = 0L; var i = 0
          while (2L * (cum + sorted(i)._2) < tot) { cum += sorted(i)._2; i += 1 }
          (f, sorted(i)._1, cum, tot)
    }
    val inMedianBucket = med.map { case (f, mb, _, _) =>
        col("flag") === lit(f) && expr(s"cents DIV $bw") === lit(mb)
    }.reduce(_ || _)
    val fineRows = base.filter(inMedianBucket)
        .groupBy("flag", "cents").agg(sum(col("w")).as("cw")).collect()
    require(fineRows.length <= bw.toInt * med.size,
        s"weightedMedian in-bucket table over its domain bound: " +
          s"${fineRows.length} rows > $bw × ${med.size} flags")
    val byFlag = fineRows.toSeq.groupBy(_.getString(0))
    val out = med.sortBy(_._1).map { case (f, _, prefw, totw) =>
        val cells = byFlag(f).map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
        var cum = prefw; var i = 0
        while (2L * (cum + cells(i)._2) < totw) { cum += cells(i)._2; i += 1 }
        val cumw = cum + cells(i)._2
        // driver twin of trunc6: floor(x·1e6)/1e6
        val share = math.floor(cumw.toDouble / totw.toDouble * 1000000L) /
          1000000.0
        (f, cells(i)._1, totw, share)
    }
    import spark.implicits._
    out.toDF("flag", "wmedian_cents", "totw", "share_at").coalesce(1)
      .sortWithinPartitions("flag")
  }

  private def aggWeightedMedian(s: SparkSession, d: String): DataFrame =
    weightedMedian(t(s, d, "lineitem"))

  private val oAggWeightedMedian =
    s"""WITH pv AS (SELECT l_returnflag AS flag,
       |    CAST(floor(l_extendedprice * 1e2 + 5e-1) AS BIGINT) AS cents,
       |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS cw
       |  FROM lineitem GROUP BY 1, 2),
       |cum AS (SELECT flag, cents, cw, CAST(sum(cw) OVER (
       |    PARTITION BY flag ORDER BY cents) AS BIGINT) AS cumw FROM pv),
       |tot AS (SELECT flag, CAST(sum(cw) AS BIGINT) AS totw FROM pv GROUP BY 1),
       |el AS (SELECT c.flag, c.cents, c.cumw, t.totw, row_number() OVER (
       |    PARTITION BY c.flag ORDER BY c.cents) AS rn
       |  FROM cum c JOIN tot t ON t.flag = c.flag
       |  WHERE 2 * c.cumw >= t.totw)
       |SELECT flag, cents AS wmedian_cents, totw,
       |  ${oTrunc6("CAST(cumw AS DOUBLE) / CAST(totw AS DOUBLE)")} AS share_at
       |FROM el WHERE rn = 1 ORDER BY flag""".stripMargin

  // ---- upsert_schema_evolve ----

  /** Latest-wins upsert where the delta batch carries a column the base
    * table never had (`priority`): the merge unions by NAME with missing
    * columns null-filled (`unionByName(allowMissingColumns)`), then
    * keeps the newest version per key — base rows surface with a NULL
    * priority, restated rows carry both the doubled price and the new
    * column. The rollup audits the merge per status: row count, exact
    * cents mass, and how many rows carry the evolved column.
    *
    * Scale shape: one shuffle on the merge key (the upsert_latest
    * row_number discipline); the rollup is a bounded-key aggregate. */
  private[graft] def schemaEvolve(orders: DataFrame): DataFrame = {
    val base = orders.select(col("o_orderkey").as("k"),
      col("o_orderstatus").as("status"),
      floor(col("o_totalprice") * lit(1e2) + lit(5e-1)).cast(LongType)
        .as("cents"),
      lit(1L).as("version"))
    val delta = orders.filter(col("o_orderkey") % 10 === 3)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
        (floor(col("o_totalprice") * lit(1e2) + lit(5e-1)).cast(LongType) *
          lit(2L)).as("cents"),
        lit(2L).as("version"), col("o_orderpriority").as("priority"))
    val merged = base.unionByName(delta, allowMissingColumns = true)
    val w = Window.partitionBy("k").orderBy(col("version").desc)
    val latest = merged.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    latest.groupBy("status")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents_total"),
        count(col("priority")).as("n_evolved"))
      .orderBy("status")
  }

  private def upsertSchemaEvolve(s: SparkSession, d: String): DataFrame =
    schemaEvolve(t(s, d, "orders"))

  private val oUpsertSchemaEvolve =
    """WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS status,
      |    CAST(floor(o_totalprice * 1e2 + 5e-1) AS BIGINT) AS cents,
      |    1 AS version, CAST(NULL AS VARCHAR) AS priority
      |  FROM orders),
      |delta AS (SELECT o_orderkey AS k, o_orderstatus AS status,
      |    CAST(floor(o_totalprice * 1e2 + 5e-1) AS BIGINT) * 2 AS cents,
      |    2 AS version, o_orderpriority AS priority
      |  FROM orders WHERE o_orderkey % 10 = 3),
      |merged AS (SELECT * FROM base UNION ALL SELECT * FROM delta),
      |latest AS (SELECT k, status, cents, priority, row_number() OVER (
      |    PARTITION BY k ORDER BY version DESC) AS rn FROM merged)
      |SELECT status, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(cents) AS BIGINT) AS cents_total,
      |  CAST(count(priority) AS BIGINT) AS n_evolved
      |FROM latest WHERE rn = 1
      |GROUP BY status ORDER BY status""".stripMargin

  // ---- mm_audio_pitch ----

  private val pitchMinLag = 2
  private val pitchMaxLag = 16

  /** Dominant periodicity via the exact mean-centered autocorrelation:
    * for lag ℓ ∈ [2, 16], r(ℓ) = Σ_i (n·s_i − S)(n·s_{i+ℓ} − S) over
    * the real RIFF/WAVE parse (S = Σs; n-scaling keeps centering
    * integral — the periodogram discipline: uncentered, the DC mass
    * drowns every lag). best_lag = argmax r(ℓ), smallest lag on ties —
    * pure BIGINT argmax, engine-exact. The oracle replays the synthesis
    * formula per sample, so a header-parse or order bug breaks the hash.
    *
    * Scale shape: mm-family per-partition batch decode; the O(n·lags)
    * kernel runs inside the partition; only the 4-column per-media
    * rollup shuffles. */
  private[graft] def audioPitch(media: org.apache.spark.sql.Dataset[
      Multimodal.MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      Multimodal.decodeWavSamples(r.payload).flatMap { s =>
        val n = s.length
        if (n <= pitchMaxLag) None
        else {
          var sum0 = 0L
          var i = 0
          while (i < n) { sum0 += s(i); i += 1 }
          var bestLag = -1
          var bestR = Long.MinValue
          var l = pitchMinLag
          while (l <= pitchMaxLag) {
            var acc = 0L
            var j = 0
            while (j < n - l) {
              acc += (n.toLong * s(j) - sum0) * (n.toLong * s(j + l) - sum0)
              j += 1
            }
            if (acc > bestR) { bestR = acc; bestLag = l }
            l += 1
          }
          Some((r.media_id, n.toLong, bestLag.toLong, bestR))
        }
      }
    }).toDF("media_id", "n_samples", "best_lag", "r_best")
      .orderBy("media_id")
  }

  private def mmAudioPitch(s: SparkSession, d: String): DataFrame =
    audioPitch(Multimodal.audioFromDocuments(s, d))

  private val oMmAudioPitch =
    s"""WITH d AS (SELECT doc_id, CAST(64 + doc_id % 64 AS BIGINT) AS n
       |  FROM documents),
       |sm AS MATERIALIZED (SELECT doc_id, n, i.i,
       |    CAST((doc_id * 37 + i.i * 11) % 2048 - 1024 AS BIGINT) AS s
       |  FROM d, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i) i),
       |cs AS (SELECT doc_id, CAST(sum(s) AS BIGINT) AS s0 FROM sm GROUP BY 1),
       |lg AS (SELECT unnest(generate_series($pitchMinLag, $pitchMaxLag)) AS l),
       |pr AS (SELECT a.doc_id, a.n, lg.l,
       |    CAST(sum((a.n * a.s - cs.s0) * (a.n * b.s - cs.s0)) AS BIGINT) AS r
       |  FROM sm a JOIN lg ON true
       |  JOIN sm b ON b.doc_id = a.doc_id AND b.i = a.i + lg.l
       |  JOIN cs ON cs.doc_id = a.doc_id
       |  GROUP BY 1, 2, 3),
       |rk AS (SELECT doc_id, n, l, r, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY r DESC, l) AS rn FROM pr)
       |SELECT doc_id AS media_id, n AS n_samples, CAST(l AS BIGINT) AS best_lag,
       |  r AS r_best
       |FROM rk WHERE rn = 1 ORDER BY media_id""".stripMargin

  val queries: Map[String, QFn] = Map(
    "agg_weighted_median"  -> aggWeightedMedian _,
    "upsert_schema_evolve" -> upsertSchemaEvolve _,
    "mm_audio_pitch"       -> mmAudioPitch _)

  val oracles: Map[String, String] = Map(
    "agg_weighted_median"  -> oAggWeightedMedian,
    "upsert_schema_evolve" -> oUpsertSchemaEvolve,
    "mm_audio_pitch"       -> oMmAudioPitch)
}
