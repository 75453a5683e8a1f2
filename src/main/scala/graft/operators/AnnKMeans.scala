package graft.operators

import graft.sources.Tables._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic seeded k-means over an embedding column, shared by the
  * IVF-style ANN search (`sim_ann_kmeans`) and the bucketed embedding
  * near-dup miner (`dedup_emb_cosine`).
  *
  * The classic IVF recipe (cf. Johnson et al., "Billion-scale similarity
  * search with GPUs"): coarse-quantize the corpus into k cells, route each
  * query to its nprobe nearest cell centroids, search only those cells.
  * Probe cost drops from O(N) to O(N·nprobe/k).
  *
  * Determinism (the property that makes these oracle-verifiable):
  *  - init = the k lowest-vec_id vectors (no RNG);
  *  - assignment ranks by trunc4(cosine) with a cell-id tiebreak;
  *  - centroid updates run through VecCentroid's scaled-long sums, which
  *    are bit-identical at any partition count.
  * So every Lloyd iteration is a pure function of the data, and DuckDB
  * reproduces it exactly from the same construction.
  *
  * Scale shape: centroids are model state (k·dim doubles — KBs), so each
  * iteration materializes them on the driver and broadcasts; the corpus is
  * only ever scanned, never shuffled by the assignment (broadcast join +
  * per-vector window). This is how distributed k-means is actually run.
  */
object AnnKMeans {

  private def cosine(a: String, b: String): Column =
    expr(s"cosine_sim($a, $b)")

  /** (score desc, cell asc) — identical ordering to the oracle's
    * row_number() OVER (ORDER BY score DESC, cell). */
  private val scoreDescCellAsc: (Column, Column) => Column = (l, r) =>
    when(l("score") > r("score"), -1)
      .when(l("score") < r("score"), 1)
      .otherwise(l("cell") - r("cell"))

  /** Top-`nprobe` cells per vector. After the broadcast join every (vector,
    * cell) score row sits in the vector's own map partition, so the
    * groupBy's partial aggregate folds all k scores into one row map-side:
    * the shuffle carries one (vec_id, v, k scores) row per vector — no
    * corpus-wide sort. (The previous Window.partitionBy(vec_id) spelling
    * shuffled AND sorted the whole corpus once per call, i.e. once per
    * Lloyd iteration.) */
  def assignProbes(e: DataFrame, cent: DataFrame, nprobe: Int): DataFrame =
    e.join(broadcast(cent))
      .select(col("vec_id"), col("v"),
        struct(trunc4(cosine("v", "cv")).as("score"), col("cell").as("cell"))
          .as("sc"))
      .groupBy("vec_id")
      .agg(first(col("v")).as("v"), collect_list(col("sc")).as("scs"))
      .select(col("vec_id"), col("v"),
        explode(slice(array_sort(col("scs"), scoreDescCellAsc), 1, nprobe))
          .as("sc"))
      .select(col("vec_id"), col("v"), col("sc.cell").as("cell"))

  /** Assign each vector (vec_id, v) to its nearest centroid (cell, cv). */
  def assign(e: DataFrame, cent: DataFrame): DataFrame =
    assignProbes(e, cent, 1)

  /** k-means centroids after `iters` Lloyd iterations, materialized each
    * round (k rows of dim doubles) and re-broadcast. Requires
    * CosineSim.register + VecCentroid.register on the session. */
  def centroids(e: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    // seed init: the k lowest-vec_id vectors, cell = rank among the seeds.
    // TakeOrdered gives the k rows; the cell index is assigned driver-side
    // (k rows of model state — the same materialization the Lloyd loop
    // below does), NOT via a global row_number window: an unpartitioned
    // window funnels its whole input through one task, and PlanSpec now
    // rejects that shape anywhere in the inventory.
    var cent = spark.createDataFrame(
      e.orderBy("vec_id").limit(k).select("vec_id", "v")
        .collect()
        .map(r => (r.getAs[Number]("vec_id").longValue, r.getSeq[Double](1)))
        .sortBy(_._1).zipWithIndex
        .map { case ((_, v), i) => (i, v) }.toIndexedSeq)
      .toDF("cell", "cv")
    for (_ <- 1 to iters) {
      val next = assign(e, cent)
        .groupBy("cell").agg(expr("vec_centroid(v)").as("cv"))
      // materialize the (tiny) model state; empty cells drop out, exactly
      // as the oracle's GROUP BY does
      import spark.implicits._
      cent = spark.createDataFrame(
        next.select(col("cell"), col("cv")).as[(Int, Seq[Double])]
          .collect().toIndexedSeq)
        .toDF("cell", "cv")
    }
    cent
  }

  /** Memoized centroids, keyed (tag, k, iters) per (session, sfDir): the
    * coarse cells are retrained identically by sim_ann_kmeans,
    * sim_knn_join, and sim_ann_ivfpq, and each PQ subspace codebook by
    * emb_pq_codebook and sim_ann_ivfpq — the fitted model is tiny
    * (k·dim doubles, materialized driver-side by construction), so
    * sharing it is the model-registry pattern, not a cache trick. The
    * builder runs the SAME deterministic fit either way; memoization
    * changes which call pays, never the bits. */
  def centroidsMemo(s: org.apache.spark.sql.SparkSession, d: String,
      tag: String, k: Int, iters: Int)(e: => DataFrame): DataFrame =
    graft.Memo.memo(s, s"cent_${tag}_${k}_$iters", d)(centroids(e, k, iters))

  /** Oracle-side twin: CTE chain c0, a1, c1, …, a_iters, c_iters where
    * `c$iters` holds the final centroids. Caller supplies the `e` CTE
    * (vec_id, v DOUBLE[]) as the first WITH entry. `dim` is the vector
    * width for the centroid unnest. `p` prefixes every CTE name (and the
    * source CTE, `${p}e`) so several chains — e.g. one per product-
    * quantization subspace — can coexist in one WITH clause. */
  def oCentroidChain(k: Int, iters: Int, dim: Int, p: String = ""): String = {
    val sb = new StringBuilder
    sb.append(
      s"""${p}c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS cell, v AS cv
         |  FROM (SELECT vec_id, v FROM ${p}e ORDER BY vec_id LIMIT $k)),
         |""".stripMargin)
    for (it <- 1 to iters) {
      sb.append(
        s"""${p}a$it AS (SELECT vec_id, v, cell FROM (
           |  SELECT e.vec_id, e.v, c.cell, row_number() OVER (PARTITION BY e.vec_id
           |    ORDER BY ${oTrunc4("list_cosine_similarity(e.v, c.cv)")} DESC, c.cell) AS r
           |  FROM ${p}e e, ${p}c${it - 1} c) WHERE r = 1),
           |${p}c$it AS (SELECT cell, list(cx ORDER BY pos) AS cv FROM (
           |  SELECT cell, i AS pos,
           |    CAST(SUM(CAST(floor(v[i] * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)/count(*)/1000000 AS cx
           |  FROM ${p}a$it, (SELECT unnest(generate_series(1, $dim)) AS i)
           |  GROUP BY cell, i) GROUP BY cell),
           |""".stripMargin)
    }
    sb.toString
  }

  /** Oracle-side twin of `assignProbes` over the final centroid CTE. */
  def oAssignProbes(centCte: String, nprobe: Int): String =
    s"""SELECT vec_id, v, cell FROM (
       |  SELECT e.vec_id, e.v, c.cell, row_number() OVER (PARTITION BY e.vec_id
       |    ORDER BY ${oTrunc4("list_cosine_similarity(e.v, c.cv)")} DESC, c.cell) AS r
       |  FROM e, $centCte c) WHERE r <= $nprobe""".stripMargin
}
