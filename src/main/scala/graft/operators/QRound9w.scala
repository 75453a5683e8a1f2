package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 22 (SURVEY §2.28) — corpus distribution QA,
  * the statistics a training-data curator runs BEFORE shipping a mix:
  *
  *  - `profile_ks_twosample`: exact two-sample Kolmogorov–Smirnov
  *    distance between the length distributions of two corpus slices
  *    (en vs rest) — the sup-norm drift test that catches shape changes
  *    PSI's fixed bins smear out.
  *  - `profile_chi2_assoc`: chi-square independence of language ×
  *    length-bucket (+ Cramér's V effect size) — "is doc length
  *    confounded with language in this corpus?".
  *  - `profile_gini_concentration`: Gini coefficient of character mass
  *    across sources — source-concentration audit (a corpus where one
  *    domain holds half the mass overfits that domain).
  */
object QRound9w extends QueryPack {

  // ---- profile_ks_twosample ----

  private val ksBucket = 64

  /** Exact two-sample KS over `n_chars`: D = max_v |F1(v) − F2(v)|,
    * carried as the INTEGER |cum1·n2 − cum2·n1| (one trunc6 division at
    * the end), so the statistic is engine-exact. The cumulative counts
    * use the distributed two-level prefix-sum: within-bucket window
    * (partitioned by `v div 64`) + broadcast bucket-prefix offsets from
    * a bounded triangular join — never a global single-partition window
    * (the PlanSpec scale gate). Reports the KS distance, its argmax
    * location (smallest value on ties), and both slice sizes.
    *
    * Scale shape: one pass → distinct-value aggregate (≤ value-domain
    * cardinality); windows partitioned per bucket; the bucket-total and
    * grand-total tables are bucket-bounded broadcasts. */
  /** Distributed two-level prefix sum over a distinct-value count table
    * `(v, c1[, c2...])`: within-bucket windows (v div width) plus
    * broadcast bucket-prefix offsets from a bounded triangular join —
    * the scalable spelling of a global cumulative (never a
    * single-partition window; PlanSpec-gated inventory-wide). Returns
    * the input columns plus `cum_<c>` for each count column. */
  private[operators] def twoLevelCum(pv0: DataFrame, width: Int,
      countCols: Seq[String]): DataFrame = {
    val pv = pv0.withColumn("bkt", expr(s"v div $width"))
    val w = Window.partitionBy("bkt").orderBy("v")
    val cumIn = countCols.foldLeft(pv) { (df, c) =>
      df.withColumn(s"w_$c", sum(col(c)).over(w))
    }
    val bt = pv.groupBy("bkt")
      .agg(countCols.map(c => sum(col(c)).as(s"b_$c")).head,
        countCols.map(c => sum(col(c)).as(s"b_$c")).tail: _*)
    val off = bt.select(col("bkt").as("obkt"))
      .join(broadcast(bt.select((col("bkt").as("pbkt") +:
        countCols.map(c => col(s"b_$c"))): _*)),
        col("pbkt") < col("obkt"), "left")
      .groupBy("obkt")
      .agg(countCols.map(c =>
          coalesce(sum(col(s"b_$c")), lit(0L)).as(s"off_$c")).head,
        countCols.map(c =>
          coalesce(sum(col(s"b_$c")), lit(0L)).as(s"off_$c")).tail: _*)
    countCols.foldLeft(
      cumIn.join(broadcast(off), col("bkt") === col("obkt"))) { (df, c) =>
        df.withColumn(s"cum_$c", col(s"w_$c") + col(s"off_$c"))
      }
      .drop((Seq("bkt", "obkt") ++
        countCols.flatMap(c => Seq(s"w_$c", s"off_$c"))): _*)
  }

  private[graft] def ksTwoSample(docs: DataFrame): DataFrame = {
    val en = col("lang") === lit("en")
    val pv = docs
      .groupBy(col("n_chars").as("v"))
      .agg(sum(when(en, 1L).otherwise(0L)).as("c1"),
        sum(when(en, 0L).otherwise(1L)).as("c2"))
    val tot = pv.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    twoLevelCum(pv, ksBucket, Seq("c1", "c2"))
      .crossJoin(broadcast(tot))
      .select(col("v"),
        col("cum_c1").as("cum1"), col("cum_c2").as("cum2"),
        col("n1"), col("n2"))
      .select(col("v"), col("n1"), col("n2"),
        abs(col("cum1") * col("n2") - col("cum2") * col("n1")).as("d_num"))
      .orderBy(col("d_num").desc, col("v").asc)
      .limit(1)
      .select(col("n1"), col("n2"), col("v").as("ks_at"), col("d_num"),
        trunc6(col("d_num").cast(DoubleType) /
          (col("n1") * col("n2")).cast(DoubleType)).as("ks"))
  }

  private def profileKsTwoSample(s: SparkSession, d: String): DataFrame =
    ksTwoSample(t(s, d, "documents"))

  private val oProfileKsTwoSample =
    s"""WITH pv AS (SELECT n_chars AS v,
       |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
       |    CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS c2
       |  FROM documents GROUP BY 1),
       |cum AS (SELECT v,
       |    CAST(sum(c1) OVER (ORDER BY v) AS BIGINT) AS cum1,
       |    CAST(sum(c2) OVER (ORDER BY v) AS BIGINT) AS cum2
       |  FROM pv),
       |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
       |    CAST(sum(c2) AS BIGINT) AS n2 FROM pv),
       |d AS (SELECT v, n1, n2, abs(cum1 * n2 - cum2 * n1) AS d_num
       |  FROM cum, tot)
       |SELECT n1, n2, v AS ks_at, CAST(d_num AS BIGINT) AS d_num,
       |  ${oTrunc6("CAST(d_num AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)")} AS ks
       |FROM d ORDER BY d_num DESC, v ASC LIMIT 1""".stripMargin

  // ---- profile_chi2_assoc ----

  private val chiBucket = 128

  /** Chi-square test of independence, language × length-bucket
    * (`n_chars div 128`): χ² = Σ_cells (o·N − r·c)² / (N·r·c), with the
    * numerator carried as an exact long product and each cell's
    * contribution scale-to-long'd at 1e12 before the (bounded) sum, so
    * the statistic is partition-order independent. Cramér's V
    * = sqrt(χ² / (N·min(R−1, C−1))) reports effect size. One row out.
    *
    * Scale shape: one corpus pass → R×C-bounded cell aggregate; row,
    * column and grand totals are bounded broadcasts joined back to the
    * cells; everything after the first aggregate is O(R·C). */
  private[graft] def chi2Assoc(docs: DataFrame): DataFrame = {
    val dd = DoubleType
    val cells = docs
      .select(col("lang"), expr(s"n_chars div $chiBucket").as("bkt"))
      .groupBy("lang", "bkt").agg(count(lit(1)).as("o"))
    val rows = cells.groupBy("lang").agg(sum(col("o")).as("r"))
    val cols0 = cells.groupBy("bkt").agg(sum(col("o")).as("c"))
    val nTot = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("lang")).as("rl"),
      countDistinct(col("bkt")).as("cl"))
    val contrib = cells
      .join(broadcast(rows), "lang")
      .join(broadcast(cols0), "bkt")
      .crossJoin(broadcast(nTot))
      .select(col("n"), col("rl"), col("cl"),
        floor(((col("o") * col("n") - col("r") * col("c")).cast(dd) *
          (col("o") * col("n") - col("r") * col("c")).cast(dd) /
          (col("n") * col("r") * col("c")).cast(dd)) * lit(1e12) + lit(0.5))
          .cast(LongType).as("x12"))
    contrib.groupBy("n", "rl", "cl")
      .agg(sum(col("x12")).as("chi12"))
      .select(col("n").as("n_docs"), col("rl").as("r_levels"),
        col("cl").as("c_levels"),
        ((col("rl") - 1) * (col("cl") - 1)).as("df"),
        trunc4(col("chi12").cast(dd) / lit(1e12)).as("chi2"),
        trunc4(sqrt(col("chi12").cast(dd) / lit(1e12) /
          (col("n") * least(col("rl") - 1, col("cl") - 1)).cast(dd)))
          .as("cramers_v"))
      .orderBy("n_docs")
  }

  private def profileChi2Assoc(s: SparkSession, d: String): DataFrame =
    chi2Assoc(t(s, d, "documents"))

  private val oProfileChi2Assoc =
    s"""WITH cells AS (SELECT lang, n_chars // $chiBucket AS bkt,
       |    CAST(count(*) AS BIGINT) AS o
       |  FROM documents GROUP BY 1, 2),
       |r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
       |c AS (SELECT bkt, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
       |t AS (SELECT CAST(sum(o) AS BIGINT) AS n,
       |    CAST(count(DISTINCT lang) AS BIGINT) AS rl,
       |    CAST(count(DISTINCT bkt) AS BIGINT) AS cl FROM cells),
       |k AS (SELECT t.n, t.rl, t.cl,
       |    CAST(floor((CAST(cells.o * t.n - r.r * c.c AS DOUBLE) *
       |      CAST(cells.o * t.n - r.r * c.c AS DOUBLE) /
       |      CAST(t.n * r.r * c.c AS DOUBLE)) * 1e12 + 5e-1) AS BIGINT)
       |      AS x12
       |  FROM cells JOIN r USING (lang) JOIN c USING (bkt), t),
       |s AS (SELECT n, rl, cl, CAST(sum(x12) AS BIGINT) AS chi12
       |  FROM k GROUP BY 1, 2, 3)
       |SELECT n AS n_docs, rl AS r_levels, cl AS c_levels,
       |  CAST((rl - 1) * (cl - 1) AS BIGINT) AS df,
       |  ${oTrunc4("CAST(chi12 AS DOUBLE) / 1e12")} AS chi2,
       |  ${oTrunc4("sqrt(CAST(chi12 AS DOUBLE) / 1e12 / " +
      "CAST(n * least(rl - 1, cl - 1) AS DOUBLE))")} AS cramers_v
       |FROM s ORDER BY n_docs""".stripMargin

  // ---- profile_gini_concentration ----

  /** Gini coefficient of character mass across sources:
    * G = Σ_{i,j} |x_i − x_j| / (2·n·Σx) over the bounded per-source
    * mass table — numerator an exact long over all ordered pairs, one
    * trunc6 division at the end. Also reports the largest single-source
    * share. G = 0 ⇔ perfectly balanced; → (n−1)/n as one source takes
    * everything.
    *
    * Scale shape: one corpus pass → source-bounded aggregate; the
    * pairwise |x_i − x_j| is a broadcast self-cross of that bounded
    * table (the survival-KM bounded-triangular discipline), never a
    * corpus-sized pair space. */
  private[graft] def giniConcentration(docs: DataFrame): DataFrame = {
    val dd = DoubleType
    val m = docs.groupBy("source").agg(sum(col("n_chars")).as("x"))
    val pairs = m.select(col("x").as("xa"))
      .crossJoin(broadcast(m.select(col("x").as("xb"))))
      .agg(sum(abs(col("xa") - col("xb"))).as("num"))
    val tot = m.agg(count(lit(1)).as("n_sources"), sum(col("x")).as("total"),
      max(col("x")).as("mx"))
    pairs.crossJoin(broadcast(tot))
      .select(col("n_sources"), col("total").as("total_chars"), col("num"),
        trunc6(col("num").cast(dd) /
          (lit(2L) * col("n_sources") * col("total")).cast(dd)).as("gini"),
        trunc6(col("mx").cast(dd) / col("total").cast(dd)).as("top_share"))
  }

  private def profileGiniConcentration(s: SparkSession, d: String): DataFrame =
    giniConcentration(t(s, d, "documents"))

  private val oProfileGiniConcentration =
    s"""WITH m AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS x
       |  FROM documents GROUP BY 1),
       |p AS (SELECT CAST(sum(abs(a.x - b.x)) AS BIGINT) AS num FROM m a, m b),
       |t AS (SELECT CAST(count(*) AS BIGINT) AS n_sources,
       |    CAST(sum(x) AS BIGINT) AS total, CAST(max(x) AS BIGINT) AS mx
       |  FROM m)
       |SELECT n_sources, total AS total_chars, num,
       |  ${oTrunc6("CAST(num AS DOUBLE) / CAST(2 * n_sources * total AS DOUBLE)")}
       |    AS gini,
       |  ${oTrunc6("CAST(mx AS DOUBLE) / CAST(total AS DOUBLE)")} AS top_share
       |FROM p, t""".stripMargin

  val queries: Map[String, QFn] = Map(
    "profile_ks_twosample"       -> profileKsTwoSample _,
    "profile_chi2_assoc"         -> profileChi2Assoc _,
    "profile_gini_concentration" -> profileGiniConcentration _)

  val oracles: Map[String, String] = Map(
    "profile_ks_twosample"       -> oProfileKsTwoSample,
    "profile_chi2_assoc"         -> oProfileChi2Assoc,
    "profile_gini_concentration" -> oProfileGiniConcentration)
}
