package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-7 wave — the IVF-PQ composition (SURVEY §2.9 north star).
  *
  *  - `sim_ann_ivfpq`: quantized ANN search — the billion-scale recipe
  *    (Jégou et al., "Product Quantization for Nearest Neighbor Search";
  *    Johnson et al., "Billion-scale similarity search with GPUs"):
  *    route each query through the coarse k-means cells (IVF), score the
  *    probed cells' members by ASYMMETRIC distance — full-precision query
  *    against each candidate's PQ RECONSTRUCTION (the concatenation of
  *    its 4 assigned subspace centroids) — to cut the cell down to a
  *    50-candidate shortlist, then EXACT-RE-RANK only the shortlist with
  *    the true vectors (the FAISS `IndexRefine` stage; 12-bit codes
  *    cannot order near-ties inside a tight cluster, so every production
  *    IVF-PQ deployment refines). At 100 TB the big scan reads 12-bit
  *    codes (+ tiny broadcast codebooks) instead of 256 B vectors — a
  *    170× I/O shrink, the entire point of PQ — and the refine touches
  *    50 full vectors per query, point-lookup volume. Emits the refined
  *    top-10 per query (with both ADC and exact scores) plus recall@10
  *    against the exact brute-force baseline (`sim_ann_recall` pattern:
  *    quality dashboard as a query).
  *
  * Scale shape: codebooks (coarse 8×64 + 4×(8×16) doubles) are broadcast
  * model state; every corpus pass is a scan-side map (broadcast joins),
  * the only shuffles are the uniform vec_id equi-joins assembling the
  * reconstructions. Determinism: the seeded AnnKMeans machinery end to
  * end (first-k-by-id init, trunc4(cosine) ranking, scaled-long centroid
  * sums), so DuckDB regenerates all 5 codebooks exactly via the prefixed
  * centroid CTE chains and the driver hash-compares the full search.
  */
object QRound7 extends QueryPack {

  private def cosine(a: String, b: String): Column =
    expr(s"cosine_sim($a, $b)")

  // coarse quantizer (IVF): same geometry as sim_ann_kmeans
  private val cCells = 8
  private val cIters = 3
  private val cProbes = 2
  private val cShort = 50 // ADC shortlist re-ranked exactly (FAISS refine)
  private val cTop = 10
  // product quantizer: same geometry as emb_pq_codebook
  private val pqSub = 4
  private val pqDim = 16
  private val pqK = 8
  private val pqIters = 2

  private def simAnnIvfpq(s: SparkSession, d: String): DataFrame = {
    graft.plans.CosineSim.register(s)
    graft.functions.VecCentroid.register(s)
    val e = QSim.embPersisted(s, d)
    e.count() // materialize the shared cache before concurrent fits race to build it
    // coarse + 4 subspace codebooks are independent fits: train them as 5
    // CONCURRENT job chains (Lloyd iterations collect model state driver-
    // side; sequential training would idle the cluster between collects —
    // the measured ~2x of emb_pq_codebook's concurrent rewrite)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val coarseF = Future(AnnKMeans.centroids(e, cCells, cIters))
    val subsF = (0 until pqSub).toList.map { sub =>
      Future {
        val es = e.select(col("vec_id"),
          slice(col("v"), sub * pqDim + 1, pqDim).as("v"))
        val cent = AnnKMeans.centroids(es, pqK, pqIters)
        AnnKMeans.assign(es, cent)
          .join(broadcast(cent), "cell")
          .select(col("vec_id"), col("cv").as(s"cv$sub"))
      }
    }
    val coarse = Await.result(coarseF, Duration.Inf)
    val subs = Await.result(Future.sequence(subsF), Duration.Inf)
    // each vector's PQ reconstruction: its 4 subspace centroids, concatenated
    val recon = subs.reduce(_.join(_, "vec_id"))
      .select(col("vec_id"),
        concat(col("cv0"), col("cv1"), col("cv2"), col("cv3")).as("rv"))
    val assigned = AnnKMeans.assign(e, coarse).select("vec_id", "cell")
    val cand = assigned.join(recon, "vec_id") // uniform-key equi-join
    val q = e.filter(col("vec_id") < 20)
    val routed = AnnKMeans.assignProbes(q, coarse, cProbes)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("cell"))
    // stage 1: ADC shortlist — scan CODES only, never the float vectors
    val wAdc = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("adc_score").desc, col("vec_id"))
    val short = cand.join(broadcast(routed), "cell")
      .select(col("qid"), col("qv"), col("vec_id"),
        trunc4(cosine("qv", "rv")).as("adc_score"))
      .withColumn("sr", row_number().over(wAdc)).filter(col("sr") <= cShort)
      .drop("sr")
    // stage 2: exact refine — true vectors for ONLY the shortlist rows
    val wExact = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score").desc, col("vec_id"))
    val top = short
      .join(e, "vec_id") // shortlist-sized side of a uniform-key equi-join
      .select(col("qid"), col("vec_id"), col("adc_score"),
        trunc4(cosine("qv", "v")).as("score"))
      .withColumn("rnk", row_number().over(wExact)).filter(col("rnk") <= cTop)
    // recall@10 vs the exact baseline, computed IN the engine
    val truth = QSim.simCosineTopk(s, d).select(col("qid"), col("vec_id"))
    val hits = top.join(truth, Seq("qid", "vec_id"), "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("h"))
    top.join(broadcast(hits), Seq("qid"), "left")
      .select(col("qid"), col("rnk"), col("vec_id"), col("adc_score"),
        col("score"),
        trunc4(coalesce(col("h"), lit(0L)) / lit(10.0)).as("recall"))
      .orderBy("qid", "rnk")
  }

  private val oSimAnnIvfpq = {
    // one prefixed centroid chain per quantizer: g = coarse (64-dim, k=8,
    // 3 iters), s0..s3 = the four 16-dim PQ subspaces (k=8, 2 iters)
    val subCtes = (0 until pqSub).map { sub =>
      val lo = sub * pqDim + 1
      val hi = (sub + 1) * pqDim
      s"""s${sub}e AS (SELECT vec_id, v[$lo:$hi] AS v FROM e),
         |${AnnKMeans.oCentroidChain(pqK, pqIters, pqDim, s"s$sub")}s${sub}x AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, c.cell, row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${oTrunc4("list_cosine_similarity(e.v, c.cv)")} DESC, c.cell) AS r
         |    FROM s${sub}e e, s${sub}c$pqIters c) WHERE r = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |ge AS (SELECT vec_id, v FROM e),
       |${AnnKMeans.oCentroidChain(cCells, cIters, 64, "g")}gx AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.cell, row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${oTrunc4("list_cosine_similarity(e.v, c.cv)")} DESC, c.cell) AS r
       |    FROM ge e, gc$cIters c) WHERE r = 1),
       |$subCtes,
       |recon AS (SELECT a0.vec_id, c0.cv || c1.cv || c2.cv || c3.cv AS rv
       |  FROM s0x a0 JOIN s0c$pqIters c0 ON a0.cell = c0.cell
       |  JOIN s1x a1 ON a1.vec_id = a0.vec_id JOIN s1c$pqIters c1 ON a1.cell = c1.cell
       |  JOIN s2x a2 ON a2.vec_id = a0.vec_id JOIN s2c$pqIters c2 ON a2.cell = c2.cell
       |  JOIN s3x a3 ON a3.vec_id = a0.vec_id JOIN s3c$pqIters c3 ON a3.cell = c3.cell),
       |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 20),
       |routed AS (SELECT qid, qv, cell FROM (
       |  SELECT q.qid, q.qv, c.cell, row_number() OVER (PARTITION BY q.qid
       |    ORDER BY ${oTrunc4("list_cosine_similarity(q.qv, c.cv)")} DESC, c.cell) AS r
       |  FROM q, gc$cIters c) WHERE r <= $cProbes),
       |cand AS (SELECT routed.qid, routed.qv, a.vec_id,
       |    ${oTrunc4("list_cosine_similarity(routed.qv, rc.rv)")} AS adc_score
       |  FROM routed JOIN gx a ON a.cell = routed.cell
       |  JOIN recon rc ON rc.vec_id = a.vec_id),
       |short AS (SELECT qid, qv, vec_id, adc_score FROM (
       |  SELECT qid, qv, vec_id, adc_score, row_number() OVER (
       |    PARTITION BY qid ORDER BY adc_score DESC, vec_id) AS sr FROM cand)
       |  WHERE sr <= $cShort),
       |top AS (SELECT qid, vec_id, adc_score, score, rnk FROM (
       |  SELECT s.qid, s.vec_id, s.adc_score,
       |    ${oTrunc4("list_cosine_similarity(s.qv, e.v)")} AS score,
       |    row_number() OVER (PARTITION BY s.qid
       |      ORDER BY ${oTrunc4("list_cosine_similarity(s.qv, e.v)")} DESC,
       |               s.vec_id) AS rnk
       |  FROM short s JOIN e ON e.vec_id = s.vec_id)
       |  WHERE rnk <= $cTop),
       |truth AS (SELECT qid, vec_id FROM (${QSim.oSimCosineTopk})),
       |hits AS (SELECT t.qid, count(*) AS h FROM top t
       |  JOIN truth tr ON tr.qid = t.qid AND tr.vec_id = t.vec_id GROUP BY t.qid)
       |SELECT t.qid, CAST(t.rnk AS INT) AS rnk, t.vec_id, t.adc_score, t.score,
       |  ${oTrunc4("coalesce(h.h, 0) / 1e1")} AS recall
       |FROM top t LEFT JOIN hits h ON h.qid = t.qid
       |ORDER BY t.qid, t.rnk""".stripMargin
  }

  val queries: Map[String, QFn] = Map(
    "sim_ann_ivfpq" -> simAnnIvfpq _)

  val oracles: Map[String, String] = Map(
    "sim_ann_ivfpq" -> oSimAnnIvfpq)
}
