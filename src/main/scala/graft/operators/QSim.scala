package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over the `embeddings` table (FLOAT[64] vectors) —
  * SURVEY.md §2.9 + the north-star ANN operators (BASELINE.json:6).
  *
  * Scale notes (100 TB / billions of vectors):
  *  - `sim_cosine_topk` is the brute-force baseline: broadcast the (small)
  *    query set against a partitioned candidate scan — linear in candidates,
  *    no shuffle of the big side, per-partition top-k folded by the window.
  *  - `sim_ann_ivf` is the scale path: assign every vector to a coarse
  *    cell (here the stored `label` plays the role of a k-means cell id),
  *    compute cell centroids, route each query to its nearest centroid, and
  *    search only that cell — the classic IVF-Flat recipe (cf. Johnson et
  *    al., "Billion-scale similarity search with GPUs", and the PAPERS.md
  *    two-stage top-k theme). Probe cost drops from O(N) to O(N/cells).
  *  - `dedup_emb_cosine` (embedding near-dup mining) bounds the pair space
  *    with `a.vec_id < b.vec_id` and would bucket by LSH/IVF cell first at
  *    real scale; the threshold filter is pushed below the top-k.
  *  - All scoring is in DOUBLE (cast up from FLOAT on both engines) and
  *    truncated to 4dp before ranking, with vec_id tiebreaks, so ranking is
  *    hash-deterministic across engines (SURVEY App. A r3).
  */
object QSim extends QueryPack {

  /** Native fused-loop cosine kernel (see graft.plans.CosineSim). The
    * equivalent pure-HOF spelling — aggregate(zip_with(a,b,(x,y)=>x*y),...)
    * — is semantically identical but far slower (per-row allocation,
    * interpreted lambda); the kernel codegens into the join stage.
    * Callers must CosineSim.register(spark) once per query. */
  private def cosine(a: String, b: String): Column =
    expr(s"cosine_sim($a, $b)")

  private def asDouble(c: Column): Column = transform(c, x => x.cast(DoubleType))

  private def embD(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))

  // ---- brute-force cosine top-k (the exact baseline) ----

  private def simCosineTopk(s: SparkSession, d: String): DataFrame = {
    graft.plans.CosineSim.register(s)
    val q = embD(s, d).filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val c = embD(s, d).select(col("vec_id"), col("v").as("cv"))
    val scored = c.join(broadcast(q))
      .select(col("qid"), col("vec_id"), trunc4(cosine("qv", "cv")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .select("qid", "rnk", "vec_id", "score")
      .orderBy("qid", "rnk")
  }

  private val oSimCosineTopk =
    s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
       |           FROM embeddings WHERE vec_id < 20),
       |  c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
       |  sc AS (SELECT qid, vec_id,
       |           ${oTrunc4("list_cosine_similarity(qv, cv)")} AS score
       |         FROM q, c),
       |  r AS (SELECT qid, vec_id, score, row_number() OVER (
       |          PARTITION BY qid ORDER BY score DESC, vec_id) AS rnk FROM sc)
       |SELECT qid, CAST(rnk AS INT) AS rnk, vec_id, score
       |FROM r WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin

  // ---- per-label centroids (vector aggregation) ----

  /** One-pass per-label mean vector via the VecCentroid aggregate: each
    * partition folds into (dim longs + count), the shuffle carries dim+1
    * longs per label — no 64× posexplode row blowup, and the scaled-long
    * accumulation is bit-deterministic at any partition count (the old
    * double avg() was not). The posexplode here runs AFTER aggregation, on
    * #labels rows, purely to shape the (label, pos, c) output. */
  private def embCentroid(s: SparkSession, d: String): DataFrame = {
    graft.functions.VecCentroid.register(s)
    embD(s, d)
      .groupBy("label")
      .agg(expr("vec_centroid(v)").as("cv"))
      .select(col("label"), posexplode(col("cv")))
      .select(col("label"), (col("pos") + 1).as("pos"), trunc4(col("col")).as("c"))
      .orderBy("label", "pos")
  }

  private val oEmbCentroid = {
    val q = graft.functions.VecCentroid.oQuant("CAST(embedding[i] AS DOUBLE)")
    s"""SELECT label, CAST(i AS INT) AS pos,
       |  ${oTrunc4("CAST(SUM(" + q + ") AS DOUBLE)/count(*)/1000000")} AS c
       |FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i)
       |GROUP BY label, i ORDER BY label, pos""".stripMargin
  }

  // ---- embedding near-duplicate pairs ----

  private def dedupEmbCosine(s: SparkSession, d: String): DataFrame = {
    graft.plans.CosineSim.register(s)
    val a = embD(s, d).select(col("vec_id").as("a_id"), col("v").as("a_v"))
    val b = embD(s, d).select(col("vec_id").as("b_id"), col("v").as("b_v"))
    a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        trunc4(cosine("a_v", "b_v")).as("score"))
      .filter(col("score") >= 0.4)
      .orderBy("a_id", "b_id")
  }

  private val oDedupEmbCosine =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
       |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |  ${oTrunc4("list_cosine_similarity(a.v, b.v)")} AS score
       |FROM e a JOIN e b ON a.vec_id < b.vec_id
       |WHERE ${oTrunc4("list_cosine_similarity(a.v, b.v)")} >= 0.4
       |ORDER BY a_id, b_id""".stripMargin

  // ---- IVF-style ANN: route query to nearest centroid cell, search cell ----

  private def simAnnIvf(s: SparkSession, d: String): DataFrame = {
    graft.plans.CosineSim.register(s)
    graft.functions.VecCentroid.register(s)
    val e = embD(s, d)
    // cell centroids in one pass (deterministic scaled-long mean — a raw
    // double avg() could flip a trunc4 digit with partition count and
    // re-route a near-tie query to a different cell)
    val cent = e.groupBy("label").agg(expr("vec_centroid(v)").as("cv"))
    val q = e.filter(col("vec_id") < 20).select(col("vec_id").as("qid"), col("v").as("qv"))
    // stage 1: nearest centroid per query (tiny cross join)
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cscore").desc, col("label"))
    val routed = q.join(broadcast(cent))
      .select(col("qid"), col("qv"), col("label"),
        trunc4(cosine("qv", "cv")).as("cscore"))
      .withColumn("r", row_number().over(wq)).filter(col("r") === 1)
      .select(col("qid"), col("qv"), col("label").as("cell"))
    // stage 2: exact search inside the routed cell only
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score").desc, col("vec_id"))
    e.join(broadcast(routed), e("label") === routed("cell"))
      .select(col("qid"), col("cell"), col("vec_id"),
        trunc4(cosine("qv", "v")).as("score"))
      .withColumn("rnk", row_number().over(wc)).filter(col("rnk") <= 3)
      .select("qid", "cell", "rnk", "vec_id", "score")
      .orderBy("qid", "rnk")
  }

  private val oSimAnnIvf = {
    val q = graft.functions.VecCentroid.oQuant("CAST(embedding[i] AS DOUBLE)")
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |  pe AS (SELECT label, i AS pos,
       |           CAST(SUM($q) AS DOUBLE)/count(*)/1000000 AS cx
       |         FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i)
       |         GROUP BY label, i),
       |  cent AS (SELECT label, list(cx ORDER BY pos) AS cv FROM pe GROUP BY label),
       |  q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 20),
       |  routed AS (SELECT qid, qv, label AS cell FROM (
       |    SELECT q.qid, q.qv, cent.label,
       |      row_number() OVER (PARTITION BY q.qid
       |        ORDER BY ${oTrunc4("list_cosine_similarity(q.qv, cent.cv)")} DESC,
       |                 cent.label) AS r
       |    FROM q, cent) WHERE r = 1),
       |  cand AS (SELECT routed.qid, routed.cell, e.vec_id,
       |      ${oTrunc4("list_cosine_similarity(routed.qv, e.v)")} AS score
       |    FROM routed JOIN e ON e.label = routed.cell),
       |  rk AS (SELECT qid, cell, vec_id, score, row_number() OVER (
       |      PARTITION BY qid ORDER BY score DESC, vec_id) AS rnk FROM cand)
       |SELECT qid, cell, CAST(rnk AS INT) AS rnk, vec_id, score
       |FROM rk WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin
  }

  val queries: Map[String, QFn] = Map(
    "sim_cosine_topk"  -> simCosineTopk _,
    "emb_centroid"     -> embCentroid _,
    "dedup_emb_cosine" -> dedupEmbCosine _,
    "sim_ann_ivf"      -> simAnnIvf _)

  val oracles: Map[String, String] = Map(
    "sim_cosine_topk"  -> oSimCosineTopk,
    "emb_centroid"     -> oEmbCentroid,
    "dedup_emb_cosine" -> oDedupEmbCosine,
    "sim_ann_ivf"      -> oSimAnnIvf)
}
