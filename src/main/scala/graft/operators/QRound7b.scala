package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Round-7 second wave — the curation operators a training-data pipeline
  * layers on top of the dedup/ANN machinery (SURVEY §2.24).
  *
  *  - `dedup_semdedup`: SEMANTIC dedup (the SemDeDup recipe, Abbas et al.
  *    2023): cluster the embedding space with k-means, call same-cell
  *    pairs above a cosine threshold semantic duplicates, and KEEP the
  *    member least similar to its cell centroid (the most atypical
  *    example — removing near-centroid redundancy is what shrinks web
  *    corpora 2× at equal downstream accuracy in the paper). Emits a
  *    per-vector verdict (keep/remove + cell + centroid similarity), i.e.
  *    the filter column a pipeline joins against, not just a pair list.
  *  - `ts_ewma_smooth`: per-user exponentially weighted moving average of
  *    daily purchase value (β = 0.7 over the trailing 8 observations,
  *    normalized over the weights actually present — the truncated
  *    `adjust=true` EWM every dataframe library ships). Spelled as an
  *    explicit lag-term sum so both engines execute the identical IEEE
  *    operation sequence.
  *  - `graph_lpa_community`: community detection by synchronous label
  *    propagation (Raghavan et al. 2007) over the LSH near-dup pair
  *    graph: 4 fixed rounds of "adopt the most frequent neighbor label"
  *    with a (count desc, label asc) total-order tiebreak, then a
  *    per-community size rollup over all documents. Where connected
  *    components finds transitive blobs, LPA splits them into densely
  *    linked groups — the difference matters for dedup clusters chained
  *    by hub boilerplate.
  *  - `mm_phash_groups`: perceptual near-dup grouping of a media lake:
  *    decode each (synthesized) P6 image, compute a quadrant average-hash
  *    (exact integer arithmetic end to end), group identical hashes into
  *    dedup buckets, and count images in adjacent buckets (Hamming
  *    distance 1) — the multimodal twin of `dedup_simhash_pairs`' banded
  *    Hamming join.
  *
  * Scale shapes: semdedup's pair space is bounded per cell (cells scale
  * with N in a real deployment — N/cells ≈ thousands — so within-cell
  * pairing is the SemDeDup paper's own cost model; the k-means fit is the
  * memoized broadcast-model loop shared with the dedup/ANN family). EWMA
  * is one window pass partitioned on uniform user_id with a fixed 8-term
  * frame. LPA is `rounds` bounded shuffles on the (sparse) edge list, all
  * keyed by vertex id; labels never leave the executors. The phash scan
  * decodes per partition and shuffles only (hash → counts) rows — the
  * group table is hash-cardinality (≤ 2^bits), so the Hamming-adjacency
  * join broadcasts.
  */
object QRound7b extends QueryPack {

  private def cosine(a: String, b: String): Column =
    expr(s"cosine_sim($a, $b)")

  // ---- SemDeDup: semantic dedup verdict over k-means cells ----

  // same cell geometry as the dedup_emb_cosine family — the memoized fit
  // (cent_emb_16_3) is shared, so whichever key runs first pays it
  private val sdCells = 16
  private val sdIters = 3

  private def dedupSemdedup(s: SparkSession, d: String): DataFrame = {
    graft.plans.CosineSim.register(s)
    graft.functions.VecCentroid.register(s)
    val e = QSim.embPersisted(s, d)
    val cent = AnnKMeans.centroidsMemo(s, d, "emb", sdCells, sdIters)(e)
    // nearest cell per vector + similarity to the OWN cell centroid (the
    // SemDeDup keep/remove ranking signal)
    val asg = AnnKMeans.assign(e, cent)
      .join(broadcast(cent), Seq("cell"))
      .select(col("vec_id"), col("v"), col("cell"),
        trunc4(cosine("v", "cv")).as("csim"))
    val a = asg.select(col("vec_id").as("a_id"), col("v").as("a_v"),
      col("cell"), col("csim").as("a_csim"))
    val b = asg.select(col("vec_id").as("b_id"), col("v").as("b_v"),
      col("cell"), col("csim").as("b_csim"))
    // b is removed iff some same-cell duplicate a outranks it: keep the
    // lower centroid similarity (more atypical), vec_id tiebreak
    val removed = a.join(b, Seq("cell"))
      .filter(col("a_id") =!= col("b_id"))
      .filter(trunc4(cosine("a_v", "b_v")) >= lit(0.4))
      .filter(col("a_csim") < col("b_csim") ||
        (col("a_csim") === col("b_csim") && col("a_id") < col("b_id")))
      .select(col("b_id").as("vec_id")).distinct()
    asg.join(removed.withColumn("rm", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("csim"),
        when(col("rm").isNotNull, lit(0)).otherwise(lit(1))
          .cast(IntegerType).as("keep"))
      .orderBy("vec_id")
  }

  private val oDedupSemdedup =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |${AnnKMeans.oCentroidChain(sdCells, sdIters, 64)}
       |asg AS (SELECT vec_id, v, cell, csim FROM (
       |  SELECT e.vec_id, e.v, c.cell,
       |    ${oTrunc4("list_cosine_similarity(e.v, c.cv)")} AS csim,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${oTrunc4("list_cosine_similarity(e.v, c.cv)")} DESC, c.cell) AS r
       |  FROM e, c$sdIters c) WHERE r = 1),
       |rem AS (SELECT DISTINCT b.vec_id FROM asg a JOIN asg b
       |  ON a.cell = b.cell AND a.vec_id <> b.vec_id
       |  WHERE ${oTrunc4("list_cosine_similarity(a.v, b.v)")} >= 4e-1
       |    AND (a.csim < b.csim OR (a.csim = b.csim AND a.vec_id < b.vec_id)))
       |SELECT g.vec_id, g.cell, g.csim, CAST(r.vec_id IS NULL AS INT) AS keep
       |FROM asg g LEFT JOIN rem r ON g.vec_id = r.vec_id
       |ORDER BY g.vec_id""".stripMargin

  // ---- EWMA smoothing of a per-user daily series ----

  private val ewW = 8 // trailing observations in the truncated EWM
  private val ewBeta = 0.7

  /** Per-user daily purchase value + its normalized trailing-8 EWMA.
    * Weights are built by repeated multiplication (β, β·β, …) — the one
    * spelling whose doubles both engines reproduce bit-identically
    * (pow()/exp() would race two libms); the term sum is written
    * left-associated in both engines, so the division's operands are
    * bit-equal and trunc4 cannot straddle a boundary. */
  private def tsEwmaSmooth(s: SparkSession, d: String): DataFrame = {
    val daily = t(s, d, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
      .agg(sum4(col("value")).as("v"))
    val w = Window.partitionBy("user_id").orderBy("day")
    var num: Column = col("v")
    var den: Column = lit(1.0)
    var wt = 1.0
    for (j <- 1 until ewW) {
      wt = wt * ewBeta
      num = num + lit(wt) * coalesce(lag(col("v"), j).over(w), lit(0.0))
      den = den + lit(wt) *
        lag(col("v"), j).over(w).isNotNull.cast(DoubleType)
    }
    daily
      .select(col("user_id"), col("day"), col("v"), trunc4(num / den).as("ewma"))
      .orderBy("user_id", "day")
  }

  private val oTsEwmaSmooth = {
    val terms = (1 until ewW).map { j =>
      val wt = List.fill(j)("7e-1").mkString("*")
      (s" + ($wt)*coalesce(lag(v, $j) OVER win, 0)",
        s" + ($wt)*CAST(lag(v, $j) OVER win IS NOT NULL AS DOUBLE)")
    }
    val num = "v" + terms.map(_._1).mkString
    val den = "1.0" + terms.map(_._2).mkString
    s"""WITH daily AS (SELECT user_id, date_trunc('day', ts) AS day,
       |    ${oSum4("value")} AS v
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
       |SELECT user_id, day, v,
       |  ${oTrunc4(s"($num) / ($den)")} AS ewma
       |FROM daily
       |WINDOW win AS (PARTITION BY user_id ORDER BY day)
       |ORDER BY user_id, day""".stripMargin
  }

  // ---- synchronous label propagation (community detection) ----

  private val lpaRounds = 4

  /** `rounds` synchronous LPA sweeps over a directed edge list (src, dst)
    * that already contains both directions: each round every node adopts
    * its neighbors' most frequent current label, ties to the smallest.
    * Pure function of the edge list (fixed rounds, total-order tiebreak),
    * which is what lets the oracle replay it CTE by CTE. */
  private[graft] def lpaOnEdges(e: DataFrame, rounds: Int): DataFrame = {
    var lab = e.select(col("src").as("id")).distinct()
      .withColumn("lab", col("id"))
    for (_ <- 1 to rounds) {
      val votes = e.join(lab.withColumnRenamed("id", "dst"), "dst")
        .groupBy("src", "lab").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("src").orderBy(col("n").desc, col("lab"))
      lab = votes.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("src").as("id"), col("lab"))
    }
    lab
  }

  /** Converged-enough LPA labels over the LSH pair graph, memoized per
    * (session, shuffle-partitions, sfDir) like the CC labels. */
  private def lpaLabels(s: SparkSession, d: String): DataFrame =
    graft.Memo.memo(s, "lpa", d) {
      val pairs = QText.queries("dedup_lsh_pairs")(s, d).select("a_id", "b_id")
      val e = pairs
        .select(col("a_id").as("src"), col("b_id").as("dst"))
        .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      lpaOnEdges(e, lpaRounds).persist(StorageLevel.MEMORY_AND_DISK)
    }

  private def graphLpaCommunity(s: SparkSession, d: String): DataFrame = {
    val lab = lpaLabels(s, d).withColumnRenamed("id", "doc_id")
    t(s, d, "documents").select("doc_id")
      .join(lab, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lab"), col("doc_id")).as("community"))
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy("community")))
      .orderBy("doc_id")
  }

  private val oGraphLpaCommunity = {
    val oPairs = QText.oracles("dedup_lsh_pairs")
    val rounds = (1 to lpaRounds).map { i =>
      s"""v$i AS (SELECT e.src, l.lab, count(*) AS n
         |    FROM e JOIN l${i - 1} l ON e.dst = l.id GROUP BY e.src, l.lab),
         |  l$i AS (SELECT src AS id, lab FROM (
         |    SELECT src, lab, row_number() OVER (
         |      PARTITION BY src ORDER BY n DESC, lab) AS r FROM v$i) WHERE r = 1),""".stripMargin
    }.mkString("\n  ")
    s"""WITH pairs AS (SELECT a_id, b_id FROM ($oPairs)),
       |  e AS (SELECT a_id AS src, b_id AS dst FROM pairs
       |        UNION ALL SELECT b_id, a_id FROM pairs),
       |  l0 AS (SELECT DISTINCT src AS id, src AS lab FROM e),
       |  $rounds
       |  m AS (SELECT d.doc_id, coalesce(l.lab, d.doc_id) AS community
       |        FROM documents d LEFT JOIN l$lpaRounds l ON d.doc_id = l.id)
       |SELECT doc_id, community,
       |  count(*) OVER (PARTITION BY community) AS n_members
       |FROM m ORDER BY doc_id""".stripMargin
  }

  // ---- perceptual-hash dedup groups over the PPM media lake ----

  private def mmPhashGroups(s: SparkSession, d: String): DataFrame = {
    val h = Multimodal.ahashAll(Multimodal.mediaFromPpm(s, d)).toDF()
    val g = h.groupBy("ahash")
      .agg(count(lit(1)).as("n_images"), min(col("media_id")).as("canon_id"))
    val nb = g.select(col("ahash").as("nb_hash"), col("n_images").as("nb_n"))
    g.join(broadcast(nb), expr("bit_count(ahash ^ nb_hash) = 1"), "left")
      .groupBy("ahash", "n_images", "canon_id")
      .agg(coalesce(sum(col("nb_n")), lit(0L)).as("n_near_images"))
      .orderBy("ahash")
  }

  /** Oracle regenerates the synthesis formula analytically (the
    * oMmResizePpm pattern): pixel byte = (id·31 + i·7) mod 256 at linear
    * channel index i = (r·w + c)·3 + ch, dims w = 4 + id%5, h = 3 + id%4.
    * The quadrant-vs-image mean test is integer cross-multiplied on both
    * sides, so the 4-bit hash is exact. */
  private val oMmPhashGroups =
    """WITH d AS (SELECT doc_id, CAST(4 + doc_id % 5 AS INT) AS w,
      |             CAST(3 + doc_id % 4 AS INT) AS h FROM documents),
      |  rr AS (SELECT doc_id, w, h, unnest(generate_series(0, h - 1)) AS r FROM d),
      |  cc AS (SELECT doc_id, w, h, r, unnest(generate_series(0, w - 1)) AS c FROM rr),
      |  px AS (SELECT doc_id, w, h, r, c, unnest(generate_series(0, 2)) AS ch FROM cc),
      |  pv AS (SELECT doc_id, w, h, r, c,
      |           (doc_id*31 + ((r*w + c)*3 + ch)*7) % 256 AS g FROM px),
      |  q AS (SELECT doc_id,
      |          CAST(r >= h//2 AS INT)*2 + CAST(c >= w//2 AS INT) AS quad,
      |          sum(g) AS sq, count(*) AS nq FROM pv GROUP BY 1, 2),
      |  tot AS (SELECT doc_id, sum(sq) AS st, sum(nq) AS nt FROM q GROUP BY 1),
      |  bits AS (SELECT q.doc_id, q.quad,
      |             CAST(q.sq * t.nt > t.st * q.nq AS INT) AS b
      |           FROM q JOIN tot t ON q.doc_id = t.doc_id),
      |  ha AS (SELECT doc_id, CAST(sum(b << quad) AS INT) AS ahash
      |         FROM bits GROUP BY 1),
      |  grp AS (SELECT ahash, count(*) AS n_images, min(doc_id) AS canon_id
      |          FROM ha GROUP BY 1)
      |SELECT a.ahash, a.n_images, a.canon_id,
      |  CAST(coalesce(sum(b.n_images), 0) AS BIGINT) AS n_near_images
      |FROM grp a LEFT JOIN grp b ON bit_count(xor(a.ahash, b.ahash)) = 1
      |GROUP BY a.ahash, a.n_images, a.canon_id
      |ORDER BY a.ahash""".stripMargin

  val queries: Map[String, QFn] = Map(
    "dedup_semdedup"      -> dedupSemdedup _,
    "ts_ewma_smooth"      -> tsEwmaSmooth _,
    "graph_lpa_community" -> graphLpaCommunity _,
    "mm_phash_groups"     -> mmPhashGroups _)

  val oracles: Map[String, String] = Map(
    "dedup_semdedup"      -> oDedupSemdedup,
    "ts_ewma_smooth"      -> oTsEwmaSmooth,
    "graph_lpa_community" -> oGraphLpaCommunity,
    "mm_phash_groups"     -> oMmPhashGroups)
}
