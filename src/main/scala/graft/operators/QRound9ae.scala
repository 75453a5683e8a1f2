package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 30 (SURVEY §2.28):
  *
  *  - `mm_dominant_colors`: 3-3-2 quantized dominant-color palette per
  *    image through the real P6 decode — the thumbnail-palette feature.
  *  - `serve_knn_lookup`: point lookup of a vector's precomputed kNN
  *    list (+ neighbor labels) — the "GET /neighbors/:id" serving
  *    endpoint over the ANN index.
  *  - `pipeline_snapshot_diff`: corpus version diff (added / removed /
  *    changed / unchanged) against the previous snapshot — the
  *    data-versioning audit every re-crawl publishes.
  */
object QRound9ae extends QueryPack {

  // ---- mm_dominant_colors ----

  private val palTopK = 3

  /** Dominant colors per image: every pixel quantizes to an 8-bit 3-3-2
    * RGB code ((r div 32)·32 + (g div 32)·4 + b div 64), per-code counts
    * rank (count desc, code asc), top-3 kept with exact pixel share
    * (trunc4). The oracle replays the P6 synthesis per pixel index, so
    * a header-parse, channel-order, or quantization bug breaks the hash.
    *
    * Scale shape: mm-family partition-batched decode; per-media
    * bounded (≤256-code) count maps fold in-partition; only the top-k
    * rollup rows shuffle. */
  private[graft] def dominantColors(media: org.apache.spark.sql.Dataset[
      Multimodal.MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      Multimodal.pixelPlane(r.payload).toSeq.flatMap { case (w, h, px) =>
        val counts = new Array[Long](256)
        var j = 0
        val n = w * h
        while (j < n) {
          val rr = px(3 * j) & 0xff
          val gg = px(3 * j + 1) & 0xff
          val bb = px(3 * j + 2) & 0xff
          counts((rr / 32) * 32 + (gg / 32) * 4 + bb / 64) += 1
          j += 1
        }
        counts.zipWithIndex.filter(_._1 > 0)
          .sortBy { case (c, code) => (-c, code) }
          .take(palTopK).zipWithIndex
          .map { case ((c, code), rank) =>
            (r.media_id, (rank + 1).toLong, code.toLong, c, n.toLong)
          }
      }
    }).toDF("media_id", "rank", "code", "cnt", "n_px")
      .select(col("media_id"), col("rank"), col("code"), col("cnt"),
        trunc4(col("cnt").cast(DoubleType) / col("n_px").cast(DoubleType))
          .as("share"))
      .orderBy("media_id", "rank")
  }

  private def mmDominantColors(s: SparkSession, d: String): DataFrame =
    dominantColors(Multimodal.mediaFromPpm(s, d))

  private val oMmDominantColors =
    s"""WITH d AS (SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
       |  FROM documents),
       |px AS (SELECT doc_id, w * h AS n_px, j.j,
       |    (doc_id * 31 + (3 * j.j) * 7) % 256 AS r,
       |    (doc_id * 31 + (3 * j.j + 1) * 7) % 256 AS g,
       |    (doc_id * 31 + (3 * j.j + 2) * 7) % 256 AS b
       |  FROM d, LATERAL (SELECT unnest(generate_series(0, w * h - 1)) AS j) j),
       |qc AS (SELECT doc_id, n_px,
       |    (r // 32) * 32 + (g // 32) * 4 + b // 64 AS code,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM px GROUP BY 1, 2, 3),
       |rk AS (SELECT doc_id, n_px, code, cnt, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY cnt DESC, code) AS rank FROM qc)
       |SELECT doc_id AS media_id, CAST(rank AS BIGINT) AS rank,
       |  CAST(code AS BIGINT) AS code, cnt,
       |  ${oTrunc4("CAST(cnt AS DOUBLE) / CAST(n_px AS DOUBLE)")} AS share
       |FROM rk WHERE rank <= $palTopK ORDER BY media_id, rank""".stripMargin

  // ---- serve_knn_lookup ----

  private val knnProbeIds = Seq(3L, 7L, 11L, 15L, 19L)

  /** Vector-serving point lookup: fetch 5 probe vectors' precomputed
    * kNN lists from the ANN index (the memoized `sim_knn_join` result)
    * with each neighbor's stored label — the read path a vector
    * database serves per request.
    *
    * Scale shape: the probe list broadcasts against the index (the
    * serve_mget discipline — the big index side never shuffles); label
    * fetch is one broadcast-able join. */
  private[graft] def knnLookup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val probes = knnProbeIds.toDF("pid")
    val knn = QSim.knnJoinPersisted(s, d)
    knn.join(broadcast(probes), col("vec_id") === col("pid"))
      .join(broadcast(t(s, d, "embeddings")
        .select(col("vec_id").as("nid"), col("label").as("n_label"))),
        col("nbr_id") === col("nid"))
      .select(col("vec_id"), col("rnk"), col("nbr_id"), col("score"),
        col("n_label"))
      .orderBy("vec_id", "rnk")
  }

  private val oServeKnnLookup =
    s"""WITH knn AS (${QSim.oracles("sim_knn_join")})
       |SELECT k.vec_id, k.rnk, k.nbr_id, k.score, e.label AS n_label
       |FROM knn k JOIN embeddings e ON e.vec_id = k.nbr_id
       |WHERE k.vec_id IN (${knnProbeIds.mkString(", ")})
       |ORDER BY k.vec_id, k.rnk""".stripMargin

  // ---- pipeline_snapshot_diff ----

  /** Corpus version diff against the previous snapshot (simulated
    * deterministically from the same table: docs with id % 17 = 0 are
    * NEW this crawl; ghost ids (id + 1000000 for id % 19 = 0) were
    * REMOVED; id % 13 = 0 docs changed text — upper-cased here, i.e. a
    * normalization change): full outer join on doc_id, per-status
    * rollup with exact char masses — the audit a versioned corpus
    * publishes with every release.
    *
    * Scale shape: the "previous snapshot" is one map pass over the
    * corpus; the diff is a single full outer join on the id key; the
    * rollup is 4 cells. */
  private[graft] def snapshotDiff(docs: DataFrame): DataFrame = {
    val cur = docs.select(col("doc_id"), col("text"), col("n_chars"))
    val prevBase = docs.filter(col("doc_id") % 17 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 13 === 0, upper(col("text")))
          .otherwise(col("text")).as("p_text"))
    val ghosts = docs.filter(col("doc_id") % 19 === 0)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"),
        col("text").as("p_text"))
    val prev = prevBase.unionByName(ghosts)
    cur.join(prev, Seq("doc_id"), "full_outer")
      .select(
        when(col("p_text").isNull, "added")
          .when(col("text").isNull, "removed")
          .when(col("text") =!= col("p_text"), "changed")
          .otherwise("unchanged").as("status"),
        coalesce(col("n_chars"), length(col("p_text")).cast(LongType))
          .as("chars"))
      .groupBy("status")
      .agg(count(lit(1)).as("n_docs"), sum(col("chars")).as("chars_total"))
      .orderBy("status")
  }

  private def pipelineSnapshotDiff(s: SparkSession, d: String): DataFrame =
    snapshotDiff(t(s, d, "documents"))

  private val oPipelineSnapshotDiff =
    """WITH cur AS (SELECT doc_id, text, n_chars FROM documents),
      |prev AS (SELECT doc_id,
      |    CASE WHEN doc_id % 13 = 0 THEN upper(text) ELSE text END AS p_text
      |  FROM documents WHERE doc_id % 17 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text AS p_text
      |  FROM documents WHERE doc_id % 19 = 0),
      |j AS (SELECT
      |    CASE WHEN p.p_text IS NULL THEN 'added'
      |      WHEN c.text IS NULL THEN 'removed'
      |      WHEN c.text <> p.p_text THEN 'changed'
      |      ELSE 'unchanged' END AS status,
      |    coalesce(c.n_chars, length(p.p_text)) AS chars
      |  FROM cur c FULL OUTER JOIN prev p ON p.doc_id = c.doc_id)
      |SELECT status, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(chars) AS BIGINT) AS chars_total
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, QFn] = Map(
    "mm_dominant_colors"    -> mmDominantColors _,
    "serve_knn_lookup"      -> (knnLookup _),
    "pipeline_snapshot_diff" -> pipelineSnapshotDiff _)

  val oracles: Map[String, String] = Map(
    "mm_dominant_colors"    -> oMmDominantColors,
    "serve_knn_lookup"      -> oServeKnnLookup,
    "pipeline_snapshot_diff" -> oPipelineSnapshotDiff)
}
