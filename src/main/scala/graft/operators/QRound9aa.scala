package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 26 (SURVEY §2.28):
  *
  *  - `sample_hard_negatives`: contrastive-training hard-negative mining
  *    — per query, the nearest neighbors with the WRONG label (near but
  *    wrong is exactly what embedding training needs to push apart).
  *  - `pipeline_epoch_plan`: data-constrained epoch planning (the
  *    repeat-capped uniform-budget recipe, cf. Muennighoff et al. 2023)
  *    — per-language repeat factors under a fixed token budget.
  *  - `agg_audience_overlap`: event-type audience intersection via
  *    64-bit word bitmaps (the roaring-bitmap shape) — set overlap
  *    without shuffling raw user rows per pair.
  */
object QRound9aa extends QueryPack {

  // ---- sample_hard_negatives ----

  private val hardNegK = 3

  /** Hard negatives per query: from the exact top-10 retrieval, the up
    * to 3 highest-scoring neighbors whose stored label differs from the
    * query's — ranked by trunc4 score (vec_id tiebreak), so the mining
    * is engine-exact. Self-hits can't appear (the query's own vector
    * shares its label).
    *
    * Scale shape: composes the memoized exact ranking (200 rows); label
    * lookups are two broadcast-able joins; ranking windows partition per
    * query. */
  private[graft] def hardNegatives(s: SparkSession, d: String): DataFrame = {
    val top = QSim.simCosineTopk(s, d)
    val lab = t(s, d, "embeddings").select(col("vec_id"), col("label"))
    val ql = lab.select(col("vec_id").as("qid"), col("label").as("q_label"))
    val nl = lab.select(col("vec_id"), col("label").as("n_label"))
    val w = Window.partitionBy("qid")
      .orderBy(col("score").desc, col("vec_id"))
    top.join(broadcast(ql), "qid").join(broadcast(nl), "vec_id")
      .filter(col("n_label") =!= col("q_label"))
      .withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= hardNegK)
      .select(col("qid"), col("neg_rank").cast(LongType).as("neg_rank"),
        col("vec_id"), col("score"), col("q_label"), col("n_label"))
      .orderBy("qid", "neg_rank")
  }

  private val oSampleHardNegatives =
    s"""WITH topk AS (${QSim.oSimCosineTopk}),
       |ql AS (SELECT vec_id AS qid, label AS q_label FROM embeddings),
       |nl AS (SELECT vec_id, label AS n_label FROM embeddings),
       |neg AS (SELECT t.qid, t.vec_id, t.score, ql.q_label, nl.n_label,
       |    row_number() OVER (PARTITION BY t.qid
       |      ORDER BY t.score DESC, t.vec_id) AS neg_rank
       |  FROM topk t JOIN ql ON ql.qid = t.qid
       |  JOIN nl ON nl.vec_id = t.vec_id
       |  WHERE nl.n_label <> ql.q_label)
       |SELECT qid, CAST(neg_rank AS BIGINT) AS neg_rank, vec_id, score,
       |  q_label, n_label
       |FROM neg WHERE neg_rank <= $hardNegK
       |ORDER BY qid, neg_rank""".stripMargin

  // ---- pipeline_epoch_plan ----

  private val epochBudgetX = 2L // total budget = 2x the corpus token mass
  private val epochMaxRepeat6 = 4000000L // repeat cap 4.0 (1e6-scaled)

  /** Data-constrained epoch plan: give every language an EQUAL share of
    * a 2×-corpus token budget (the flattening recipe — proportional
    * allocation would trivially repeat everything 2×), cap repeats at
    * 4 epochs (beyond ~4 repeats, extra epochs stop helping — the
    * data-constrained-scaling observation): repeat6 = min(4e6,
    * (budget/L)·1e6 / mass_l) with truncating integer division, and
    * tokens_out = repeat6·mass_l / 1e6 — every number an exact BIGINT.
    *
    * Scale shape: one corpus pass → #langs-bounded mass aggregate;
    * totals broadcast back; the plan itself is model state. */
  private[graft] def epochPlan(docs: DataFrame): DataFrame = {
    val dd = DoubleType
    val mass = docs
      .select(col("lang"), size(split(col("text"), " ")).cast(LongType)
        .as("toks"))
      .groupBy("lang").agg(sum(col("toks")).as("mass"))
    val tot = mass.agg(sum(col("mass")).as("total"),
      count(lit(1)).as("n_langs"))
    mass.crossJoin(broadcast(tot))
      .select(col("lang"), col("mass"), col("total"),
        trunc6(col("mass").cast(dd) / col("total").cast(dd)).as("share"),
        least(lit(epochMaxRepeat6),
          expr(s"($epochBudgetX * total div n_langs) * 1000000 div mass"))
          .as("repeat6"))
      .withColumn("tokens_out", expr("repeat6 * mass div 1000000"))
      .withColumn("capped",
        when(col("repeat6") === epochMaxRepeat6, 1L).otherwise(0L))
      .select("lang", "mass", "share", "repeat6", "tokens_out", "capped")
      .orderBy("lang")
  }

  private def pipelineEpochPlan(s: SparkSession, d: String): DataFrame =
    epochPlan(t(s, d, "documents"))

  private val oPipelineEpochPlan =
    s"""WITH m AS (SELECT lang,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS mass
       |  FROM documents GROUP BY 1),
       |t AS (SELECT CAST(sum(mass) AS BIGINT) AS total,
       |    CAST(count(*) AS BIGINT) AS n_langs FROM m)
       |SELECT lang, mass,
       |  ${oTrunc6("CAST(mass AS DOUBLE) / CAST(total AS DOUBLE)")} AS share,
       |  least($epochMaxRepeat6,
       |    (($epochBudgetX * total // n_langs) * 1000000) // mass) AS repeat6,
       |  (least($epochMaxRepeat6,
       |    (($epochBudgetX * total // n_langs) * 1000000) // mass) * mass)
       |    // 1000000 AS tokens_out,
       |  CAST(CASE WHEN least($epochMaxRepeat6,
       |    (($epochBudgetX * total // n_langs) * 1000000) // mass)
       |    = $epochMaxRepeat6 THEN 1 ELSE 0 END AS BIGINT) AS capped
       |FROM m, t ORDER BY lang""".stripMargin

  // ---- agg_audience_overlap ----

  /** Audience overlap between event types through 64-bit word bitmaps:
    * users bucket into words of 64 (bucket = user div 64, bit = user
    * mod 64), each (type, bucket) folds to one BIGINT by bit_or, and a
    * pair's intersection is Σ bit_count(wa & wb) over co-bucketed words
    * — the roaring-bitmap shape: per-pair work is proportional to the
    * COMPRESSED audience size, and raw user rows never join. Union and
    * Jaccard derive by inclusion-exclusion; all counts exact.
    *
    * Scale shape: one events pass → (type, bucket) bit_or aggregate
    * (64× smaller than the distinct-user table); the pair join is
    * bucket-keyed over that compressed table; per-type sizes broadcast. */
  private[graft] def audienceOverlap(events: DataFrame): DataFrame = {
    val dd = DoubleType
    val words = events
      .select(col("event_type").as("t"),
        expr("user_id div 64").as("bkt"),
        expr("shiftleft(1L, int(user_id % 64))").as("bit"))
      .groupBy("t", "bkt").agg(expr("bit_or(bit)").as("w"))
    val sizes = words.groupBy("t")
      .agg(sum(expr("bit_count(w)")).cast(LongType).as("n"))
    val a = words.select(col("t").as("t1"), col("bkt"), col("w").as("w1"))
    val b = words.select(col("t").as("t2"), col("bkt").as("bkt2"),
      col("w").as("w2"))
    val inter = a.join(b, col("bkt") === col("bkt2") && col("t1") < col("t2"))
      .groupBy("t1", "t2")
      .agg(sum(expr("bit_count(w1 & w2)")).cast(LongType).as("inter"))
      // co-bucketed words can share zero bits: drop empty intersections
      // so the output matches exact set algebra (which has no such row)
      .filter(col("inter") > 0)
    inter
      .join(broadcast(sizes.select(col("t").as("t1"), col("n").as("n1"))), "t1")
      .join(broadcast(sizes.select(col("t").as("t2"), col("n").as("n2"))), "t2")
      .select(col("t1"), col("t2"), col("n1"), col("n2"), col("inter"),
        (col("n1") + col("n2") - col("inter")).as("uni"),
        trunc6(col("inter").cast(dd) /
          (col("n1") + col("n2") - col("inter")).cast(dd)).as("jaccard"))
      .orderBy("t1", "t2")
  }

  private def aggAudienceOverlap(s: SparkSession, d: String): DataFrame =
    audienceOverlap(t(s, d, "events"))

  private val oAggAudienceOverlap =
    s"""WITH u AS (SELECT DISTINCT event_type AS t, user_id AS uid FROM events),
       |sz AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM u GROUP BY 1),
       |iv AS (SELECT a.t AS t1, b.t AS t2, CAST(count(*) AS BIGINT) AS inter
       |  FROM u a JOIN u b ON a.uid = b.uid AND a.t < b.t GROUP BY 1, 2)
       |SELECT iv.t1, iv.t2, s1.n AS n1, s2.n AS n2, iv.inter,
       |  s1.n + s2.n - iv.inter AS uni,
       |  ${oTrunc6("CAST(iv.inter AS DOUBLE) / CAST(s1.n + s2.n - iv.inter AS DOUBLE)")}
       |    AS jaccard
       |FROM iv JOIN sz s1 ON s1.t = iv.t1 JOIN sz s2 ON s2.t = iv.t2
       |ORDER BY iv.t1, iv.t2""".stripMargin

  val queries: Map[String, QFn] = Map(
    "sample_hard_negatives" -> (hardNegatives _),
    "pipeline_epoch_plan"   -> pipelineEpochPlan _,
    "agg_audience_overlap"  -> aggAudienceOverlap _)

  val oracles: Map[String, String] = Map(
    "sample_hard_negatives" -> oSampleHardNegatives,
    "pipeline_epoch_plan"   -> oPipelineEpochPlan,
    "agg_audience_overlap"  -> oAggAudienceOverlap)
}
