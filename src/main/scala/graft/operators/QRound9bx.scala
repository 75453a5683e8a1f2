package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 75 (SURVEY §2.28):
  *
  *  - `ts_cointegration_egr`: Engle–Granger two-step cointegration test
  *    between every ordered series pair — do two trending series share a
  *    stable long-run relationship.
  *  - `mm_hist_emd_outliers`: earth-mover distance between each image's
  *    REAL decoded 16-bin byte histogram and the corpus average — the
  *    distribution-level odd-image detector.
  *  - `chp_user_entropy`: per-user behavioral entropy (event-type mix)
  *    bucketed into a segmentation histogram.
  */
object QRound9bx extends QueryPack {

  private val dd = DoubleType

  // ---- ts_cointegration_egr ----

  // shared towers: step-1 OLS coefficients and the no-constant ADF t
  private val egB = "CAST(sxy AS DOUBLE)/nullif(CAST(sxx AS DOUBLE), 0e0)"
  private val egA =
    "(CAST(sy AS DOUBLE) - beta*CAST(sx AS DOUBLE))/CAST(np AS DOUBLE)"
  private val egRho = "CAST(sed AS DOUBLE)/nullif(CAST(see AS DOUBLE), 0e0)"
  private val egT =
    "rho/nullif(sqrt((CAST(sdd AS DOUBLE) - rho*CAST(sed AS DOUBLE))" +
      "/CAST(na - 1 AS DOUBLE)/CAST(see AS DOUBLE)), 0e0)"

  /** Engle–Granger per ordered pair: step 1 regresses y on x with exact
    * centered BIGINT moments; step 2 scale-to-longs the residuals at
    * 1e6 (so the unit-root regression runs on EXACT integers) and fits
    * Δe_t = ρ·e_{t−1} without constant; the ADF t-statistic passes
    * through a shared tower and the verdict cuts trunc4(t) at the
    * −1.95 5% critical value. Cointegrated = the spread mean-reverts.
    *
    * Scale shape: the pair join is types²×days; two lag windows and
    * two rollups per pair. */
  private[graft] def cointegrationEgr(s: SparkSession, d: String): DataFrame = {
    val daily = QRound9b.evDaily(s, d)
    val a = daily.select(col("event_type").as("x_type"), col("day_num"),
      col("cnt").as("xc"))
    val b = daily.select(col("event_type").as("y_type"), col("day_num"),
      col("cnt").as("yc"))
    val j = a.join(b, "day_num").filter(col("x_type") =!= col("y_type"))
    val m = j.groupBy("x_type", "y_type").agg(count(lit(1)).as("np"),
      sum("xc").as("sx"), sum("yc").as("sy"),
      sum(col("xc") * col("xc")).as("rxx"),
      sum(col("xc") * col("yc")).as("rxy"))
    val coef = m
      .withColumn("sxx", col("np") * col("rxx") - col("sx") * col("sx"))
      .withColumn("sxy", col("np") * col("rxy") - col("sx") * col("sy"))
      .withColumn("beta", expr(egB)).withColumn("alpha", expr(egA))
      .select("x_type", "y_type", "np", "beta", "alpha")
    val res = j.join(broadcast(coef), Seq("x_type", "y_type"))
      .select(col("x_type"), col("y_type"), col("day_num"), col("np"),
        col("beta"),
        floor((col("yc").cast(dd) - col("alpha")
          - col("beta") * col("xc").cast(dd)) * lit(1e6) + lit(0.5))
          .cast(LongType).as("e_sc"))
    val w = Window.partitionBy("x_type", "y_type").orderBy("day_num")
    val du = res.withColumn("e_prev", lag("e_sc", 1).over(w))
      .filter(col("e_prev").isNotNull)
      .withColumn("de", col("e_sc") - col("e_prev"))
    du.groupBy("x_type", "y_type", "np", "beta").agg(
        count(lit(1)).as("na"),
        sum(col("e_prev") * col("e_prev")).as("see"),
        sum(col("e_prev") * col("de")).as("sed"),
        sum(col("de") * col("de")).as("sdd"))
      .withColumn("rho", expr(egRho))
      .withColumn("adf_t", expr(egT))
      .select(col("x_type"), col("y_type"), col("np").as("n_obs"),
        trunc6(col("beta")).as("beta"),
        trunc4(col("adf_t")).as("adf_t"),
        (trunc4(col("adf_t")) < lit(-1.95)).cast(IntegerType)
          .as("cointegrated"))
      .orderBy("x_type", "y_type")
  }

  private val oTsCointegration =
    s"""WITH daily AS (SELECT event_type,
       |    epoch_us(date_trunc('day', ts)) // 86400000000 AS day_num,
       |    count(*) AS cnt FROM events GROUP BY 1, 2),
       |j AS (SELECT a.event_type AS x_type, b.event_type AS y_type,
       |    a.day_num, a.cnt AS xc, b.cnt AS yc
       |  FROM daily a JOIN daily b USING (day_num)
       |  WHERE a.event_type <> b.event_type),
       |m AS (SELECT x_type, y_type, count(*) AS np,
       |    CAST(sum(xc) AS BIGINT) AS sx, CAST(sum(yc) AS BIGINT) AS sy,
       |    CAST(sum(xc*xc) AS BIGINT) AS rxx,
       |    CAST(sum(xc*yc) AS BIGINT) AS rxy
       |  FROM j GROUP BY 1, 2),
       |cf AS (SELECT *, np*rxx - sx*sx AS sxx, np*rxy - sx*sy AS sxy
       |  FROM m),
       |cf2 AS (SELECT *, ($egB) AS beta FROM cf),
       |cf3 AS (SELECT *, ($egA) AS alpha FROM cf2),
       |res AS (SELECT j.x_type, j.y_type, j.day_num, np, beta,
       |    CAST(floor((CAST(yc AS DOUBLE) - alpha - beta*CAST(xc AS DOUBLE))
       |      * 1e6 + 5e-1) AS BIGINT) AS e_sc
       |  FROM j JOIN cf3 ON j.x_type = cf3.x_type AND j.y_type = cf3.y_type),
       |du AS (SELECT x_type, y_type, np, beta, e_sc,
       |    lag(e_sc) OVER (PARTITION BY x_type, y_type ORDER BY day_num)
       |      AS e_prev
       |  FROM res),
       |ag AS (SELECT x_type, y_type, np, beta, count(*) AS na,
       |    CAST(sum(e_prev*e_prev) AS BIGINT) AS see,
       |    CAST(sum(e_prev*(e_sc - e_prev)) AS BIGINT) AS sed,
       |    CAST(sum((e_sc - e_prev)*(e_sc - e_prev)) AS BIGINT) AS sdd
       |  FROM du WHERE e_prev IS NOT NULL GROUP BY 1, 2, 3, 4),
       |r1 AS (SELECT *, ($egRho) AS rho FROM ag),
       |r2 AS (SELECT *, ($egT) AS adf_t FROM r1)
       |SELECT x_type, y_type, np AS n_obs, ${oTrunc6("beta")} AS beta,
       |  ${oTrunc4("adf_t")} AS adf_t,
       |  CAST(${oTrunc4("adf_t")} < -195e-2 AS INT) AS cointegrated
       |FROM r2 ORDER BY x_type, y_type""".stripMargin

  // ---- mm_hist_emd_outliers ----

  /** Histogram EMD outliers: each image's REAL decoded 16-bin byte
    * histogram (Multimodal.histBins16 — actual P6 parse) normalized by
    * scale-to-long at 1e9, the corpus-mean histogram by exact floor
    * division, and the 1-D earth-mover distance as the exact integer
    * Σ|cum_i − cum_avg| over bins; top-10 most anomalous images. The
    * oracle never parses bytes — it replays the synthesis formula.
    *
    * Scale shape: decode is per-partition batch; the per-image rollups
    * key on media × 16 bins; the average is a broadcast 16-row table. */
  private[graft] def histEmdOutliers(s: SparkSession, d: String): DataFrame = {
    val hist = Multimodal.histAll(Multimodal.mediaFromPpm(s, d)).toDF()
    val bins = hist.select(col("media_id"), col("n_pix"),
        posexplode(col("bins")))
      .select(col("media_id"), col("pos").as("b"),
        floor(col("col").cast(dd) * lit(1e9) / col("n_pix").cast(dd)
          + lit(0.5)).cast(LongType).as("hn"))
    val nImg = hist.agg(count(lit(1)).as("n_img"))
    val avg = bins.groupBy("b").agg(sum("hn").as("sh"))
      .crossJoin(broadcast(nImg))
      .select(col("b"), expr("sh div n_img").as("ah"))
    val wCum = Window.partitionBy("media_id").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bins.withColumn("ch", sum("hn").over(wCum))
    // 16-row cumulative via a bounded self-join (no global window)
    val cumA = avg.select(col("b").as("b1"), col("ah"))
      .join(broadcast(avg.select(col("b").as("b2"),
        col("ah").as("ah2"))), col("b2") <= col("b1"))
      .groupBy(col("b1").as("b")).agg(sum("ah2").as("ca"))
    val emd = cum.join(broadcast(cumA), "b")
      .groupBy("media_id").agg(sum(abs(col("ch") - col("ca"))).as("emd_sc"))
    val top = emd.orderBy(col("emd_sc").desc, col("media_id")).limit(10)
    top.agg(expr(
        "array_sort(collect_list(struct(-emd_sc AS ns, media_id, emd_sc)))")
        .as("a"))
      .select(posexplode(col("a")))
      .select((col("pos") + 1).cast(IntegerType).as("rnk"),
        col("col.media_id").as("media_id"), col("col.emd_sc").as("emd_sc"),
        trunc4(col("col.emd_sc").cast(dd) / lit(1e9) / lit(16.0))
          .as("emd_norm"))
      .orderBy("rnk")
  }

  private val oMmHistEmd =
    s"""WITH d AS (SELECT doc_id, CAST(4 + doc_id % 5 AS INT) AS w,
       |    CAST(3 + doc_id % 4 AS INT) AS h FROM documents),
       |px AS (SELECT doc_id, w, h, ((doc_id*31 + i*7) % 256) // 16 AS b
       |  FROM d, LATERAL (SELECT unnest(generate_series(0, w*h*3 - 1))
       |    AS i)),
       |cnts AS (SELECT doc_id, b, count(*) AS c FROM px GROUP BY 1, 2),
       |npx AS (SELECT doc_id, CAST(w*h*3 AS BIGINT) AS n_pix FROM d),
       |grid AS (SELECT doc_id, unnest(range(16)) AS b FROM d),
       |full16 AS (SELECT g.doc_id, g.b, coalesce(c.c, 0) AS c
       |  FROM grid g LEFT JOIN cnts c ON c.doc_id = g.doc_id AND c.b = g.b),
       |hn AS (SELECT f.doc_id, b, CAST(floor(CAST(c AS DOUBLE)*1e9
       |    /CAST(n_pix AS DOUBLE) + 5e-1) AS BIGINT) AS hn
       |  FROM full16 f JOIN npx ON npx.doc_id = f.doc_id),
       |ni AS (SELECT count(*) AS n_img FROM d),
       |avg16 AS (SELECT b, CAST(sum(hn) AS BIGINT) // n_img AS ah
       |  FROM hn, ni GROUP BY b, n_img),
       |cum AS (SELECT doc_id, b, CAST(sum(hn) OVER (PARTITION BY doc_id
       |    ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS BIGINT) AS ch FROM hn),
       |cuma AS (SELECT b, CAST(sum(ah) OVER (ORDER BY b
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS ca FROM avg16),
       |emd AS (SELECT doc_id AS media_id,
       |    CAST(sum(abs(ch - ca)) AS BIGINT) AS emd_sc
       |  FROM cum JOIN cuma USING (b) GROUP BY 1),
       |r AS (SELECT *, row_number() OVER (ORDER BY emd_sc DESC, media_id)
       |    AS rnk FROM emd)
       |SELECT CAST(rnk AS INT) AS rnk, media_id, emd_sc,
       |  ${oTrunc4("CAST(emd_sc AS DOUBLE)/1e9/16e0")} AS emd_norm
       |FROM r WHERE rnk <= 10 ORDER BY rnk""".stripMargin

  // ---- chp_user_entropy ----

  /** Behavioral entropy segmentation: per user the Shannon entropy of
    * their event-type mix (per-term 1e12 scale-to-long — exact sums),
    * bucketed at 0.01-nat width into the corpus-level histogram with a
    * per-bucket scale-to-long mean. Low entropy = single-minded users,
    * high = diverse browsers.
    *
    * Scale shape: one (user, type) rollup, one user rollup, one
    * bucket rollup — all uniform keys. */
  private[graft] def userEntropy(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
    val ut = ev.groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
    val un = ut.groupBy("user_id").agg(sum("c").as("n"))
    val h = ut.join(un, "user_id")
      .withColumn("term_sc", floor(
        col("c").cast(dd) / col("n").cast(dd)
          * log(col("n").cast(dd) / col("c").cast(dd)) * lit(1e12)
          + lit(0.5)).cast(LongType))
      .groupBy("user_id").agg(sum("term_sc").as("h_sc"))
    h.withColumn("bucket", expr("CAST(h_sc div 10000000000 AS INT)"))
      .groupBy("bucket").agg(count(lit(1)).as("n_users"),
        sum("h_sc").as("sh"))
      .select(col("bucket"), col("n_users"),
        trunc4(col("sh").cast(dd) / col("n_users").cast(dd) / lit(1e12))
          .as("mean_entropy"))
      .orderBy("bucket")
  }

  private val oChpUserEntropy =
    s"""WITH ut AS (SELECT user_id, event_type, count(*) AS c
       |  FROM events GROUP BY 1, 2),
       |un AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n FROM ut
       |  GROUP BY 1),
       |h AS (SELECT ut.user_id, CAST(sum(CAST(floor(
       |    CAST(c AS DOUBLE)/CAST(n AS DOUBLE)
       |    * ln(CAST(n AS DOUBLE)/CAST(c AS DOUBLE)) * 1e12 + 5e-1)
       |    AS BIGINT)) AS BIGINT) AS h_sc
       |  FROM ut JOIN un USING (user_id) GROUP BY 1)
       |SELECT CAST(h_sc // 10000000000 AS INT) AS bucket,
       |  CAST(count(*) AS BIGINT) AS n_users,
       |  ${oTrunc4("CAST(sum(h_sc) AS DOUBLE)/count(*)/1e12")}
       |    AS mean_entropy
       |FROM h GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, QFn] = Map(
    "ts_cointegration_egr" -> ((s, d) => cointegrationEgr(s, d)),
    "mm_hist_emd_outliers" -> ((s, d) => histEmdOutliers(s, d)),
    "chp_user_entropy"     -> ((s, d) => userEntropy(s, d)))

  val oracles: Map[String, String] = Map(
    "ts_cointegration_egr" -> oTsCointegration,
    "mm_hist_emd_outliers" -> oMmHistEmd,
    "chp_user_entropy"     -> oChpUserEntropy)
}
