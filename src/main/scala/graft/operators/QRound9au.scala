package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 46 (SURVEY §2.28):
  *
  *  - `chp_cuped_adjust`: CUPED variance reduction (Deng et al. 2013) —
  *    the pre-period covariate adjustment every experimentation platform
  *    applies before reading an A/B metric.
  *  - `mm_brightness_centroid`: brightness center-of-mass per image
  *    through the real P6 decode — the crop/attention hint, exact in
  *    integer moments.
  *  - `ds_typed_join`: the typed `Dataset.joinWith` surface — pair-typed
  *    join results consumed without losing the case-class views.
  */
object QRound9au extends QueryPack {

  // ---- chp_cuped_adjust ----

  /** CUPED: per user the pre-period spend X (day < 16) and post-period
    * spend Y (day ≥ 16); θ = cov(X,Y)/var(X), ρ² = cov²/(var·var), and
    * the adjusted metric variance var(Y)·(1−ρ²) — how much narrower the
    * experiment's confidence interval gets for free. All second moments
    * accumulate as DECIMAL(37,8) products of DECIMAL(18,4) spends
    * (exact), cast to double only inside the final covariance algebra;
    * trunc4 once per output.
    *
    * Scale shape: one per-user aggregate (map-side partial), one 6-sum
    * global rollup — the classic two-pass-free moment computation. */
  private[graft] def cupedAdjust(events: DataFrame): DataFrame = {
    val dd = DoubleType
    val d4 = DecimalType(18, 4)
    val user = events
      .groupBy("user_id")
      .agg(
        sum(when(dayofmonth(col("ts")) < 16, col("value").cast(d4))
          .otherwise(lit(0).cast(d4))).cast(d4).as("x"),
        sum(when(dayofmonth(col("ts")) >= 16, col("value").cast(d4))
          .otherwise(lit(0).cast(d4))).cast(d4).as("y"))
    val m = user.agg(
        count(lit(1)).as("n"),
        sum(col("x")).cast(dd).as("sx"),
        sum(col("y")).cast(dd).as("sy"),
        sum(col("x") * col("x")).cast(dd).as("sxx"),
        sum(col("y") * col("y")).cast(dd).as("syy"),
        sum(col("x") * col("y")).cast(dd).as("sxy"))
    m.select(col("n"),
        ((col("sxy") - col("sx") * col("sy") / col("n").cast(dd)) /
          (col("sxx") - col("sx") * col("sx") / col("n").cast(dd)))
          .as("theta_raw"),
        ((col("sxy") - col("sx") * col("sy") / col("n").cast(dd)) *
          (col("sxy") - col("sx") * col("sy") / col("n").cast(dd)) /
          ((col("sxx") - col("sx") * col("sx") / col("n").cast(dd)) *
           (col("syy") - col("sy") * col("sy") / col("n").cast(dd))))
          .as("rho2_raw"),
        ((col("syy") - col("sy") * col("sy") / col("n").cast(dd)) /
          col("n").cast(dd)).as("vy_raw"))
      .select(col("n"), trunc4(col("theta_raw")).as("theta"),
        trunc4(col("rho2_raw")).as("rho2"),
        trunc4(col("vy_raw")).as("var_y"),
        trunc4(col("vy_raw") * (lit(1.0) - col("rho2_raw")))
          .as("var_y_adj"))
  }

  private def chpCupedAdjust(s: SparkSession, d: String): DataFrame =
    cupedAdjust(t(s, d, "events"))

  private val oChpCupedAdjust =
    s"""WITH u AS (SELECT user_id,
       |    CAST(sum(CASE WHEN day(ts) < 16 THEN CAST(value AS DECIMAL(18,4))
       |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS x,
       |    CAST(sum(CASE WHEN day(ts) >= 16 THEN CAST(value AS DECIMAL(18,4))
       |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS y
       |  FROM events GROUP BY user_id),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
       |    CAST(sum(x * x) AS DOUBLE) AS sxx,
       |    CAST(sum(y * y) AS DOUBLE) AS syy,
       |    CAST(sum(x * y) AS DOUBLE) AS sxy
       |  FROM u),
       |r AS (SELECT n,
       |    (sxy - sx * sy / n) / (sxx - sx * sx / n) AS theta_raw,
       |    (sxy - sx * sy / n) * (sxy - sx * sy / n) /
       |      ((sxx - sx * sx / n) * (syy - sy * sy / n)) AS rho2_raw,
       |    (syy - sy * sy / n) / n AS vy_raw
       |  FROM m)
       |SELECT n, ${oTrunc4("theta_raw")} AS theta,
       |  ${oTrunc4("rho2_raw")} AS rho2,
       |  ${oTrunc4("vy_raw")} AS var_y,
       |  ${oTrunc4("vy_raw * (1e0 - rho2_raw)")} AS var_y_adj
       |FROM r""".stripMargin

  // ---- mm_brightness_centroid ----

  /** Brightness center-of-mass per image through the real P6 parse:
    * per pixel the gray mass g = r+g+b; the centroid
    * (Σx·g/Σg, Σy·g/Σg) is the crop/attention hint. Moments are exact
    * BIGINTs; the two divisions happen once at the end (trunc4). The
    * oracle replays the synthesis formula per pixel index, so a plane
    * offset or interleave bug breaks the hash.
    *
    * Scale shape: per-partition batch decode; one small rollup row per
    * image. */
  private[graft] def brightnessCentroid(media: org.apache.spark.sql.Dataset[
      Multimodal.MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    val dd = DoubleType
    media.mapPartitions(_.flatMap { r =>
      Multimodal.pixelPlane(r.payload).map { case (w, h, plane) =>
        var mass = 0L; var mx = 0L; var my = 0L
        var p = 0
        val nPix = w * h
        while (p < nPix) {
          val g = (plane(3 * p) & 0xff) + (plane(3 * p + 1) & 0xff) +
            (plane(3 * p + 2) & 0xff)
          mass += g
          mx += (p % w).toLong * g
          my += (p / w).toLong * g
          p += 1
        }
        (r.media_id, w, h, mass, mx, my)
      }
    }).toDF("media_id", "width", "height", "mass", "mx", "my")
      .select(col("media_id"), col("width"), col("height"), col("mass"),
        trunc4(col("mx").cast(dd) / col("mass").cast(dd)).as("com_x"),
        trunc4(col("my").cast(dd) / col("mass").cast(dd)).as("com_y"))
      .orderBy("media_id")
  }

  private def mmBrightnessCentroid(s: SparkSession, d: String): DataFrame =
    brightnessCentroid(Multimodal.mediaFromPpm(s, d))

  private val oMmBrightnessCentroid =
    s"""WITH d AS (SELECT doc_id, CAST(4 + doc_id % 5 AS BIGINT) AS w,
       |    CAST(3 + doc_id % 4 AS BIGINT) AS h FROM documents),
       |px AS (SELECT doc_id, w, h, p.p, p.p % w AS x, p.p // w AS y,
       |    (doc_id * 31 + (3 * p.p) * 7) % 256
       |      + (doc_id * 31 + (3 * p.p + 1) * 7) % 256
       |      + (doc_id * 31 + (3 * p.p + 2) * 7) % 256 AS g
       |  FROM d, LATERAL (SELECT unnest(generate_series(0, w * h - 1))
       |    AS p) p),
       |a AS (SELECT doc_id, CAST(max(w) AS INT) AS width,
       |    CAST(max(h) AS INT) AS height,
       |    CAST(sum(g) AS BIGINT) AS mass,
       |    CAST(sum(x * g) AS BIGINT) AS mx,
       |    CAST(sum(y * g) AS BIGINT) AS my
       |  FROM px GROUP BY doc_id)
       |SELECT doc_id AS media_id, width, height, mass,
       |  ${oTrunc4("CAST(mx AS DOUBLE) / mass")} AS com_x,
       |  ${oTrunc4("CAST(my AS DOUBLE) / mass")} AS com_y
       |FROM a ORDER BY media_id""".stripMargin

  // ---- ds_typed_join ----

  case class TjOrd(o_custkey: Long, o_totalprice: Double)
  case class TjCust(c_custkey: Long, c_mktsegment: String)

  /** Typed `joinWith`: orders pair with their customer as
    * (TjOrd, TjCust) tuples — both case-class views survive the join
    * (unlike a flat DataFrame join, which loses the typed handles).
    * The pair Dataset is then re-projected relationally and aggregated
    * per market segment with the exact DECIMAL sum.
    *
    * Scale shape: joinWith plans the same broadcast-able equi-join as
    * the untyped API (customer is the dim side); the aggregate is a
    * 5-row rollup with map-side combine. */
  private[graft] def typedJoin(orders: DataFrame, customer: DataFrame): DataFrame = {
    import orders.sparkSession.implicits._
    val o = orders.select(col("o_custkey"), col("o_totalprice")).as[TjOrd]
    val c = customer.select(col("c_custkey"), col("c_mktsegment")).as[TjCust]
    val paired = o.joinWith(broadcast(c),
      o("o_custkey") === c("c_custkey"), "inner")
    paired
      .select(col("_2.c_mktsegment").as("c_mktsegment"),
        col("_1.o_totalprice").as("o_totalprice"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum4(col("o_totalprice")).as("total_price"))
      .orderBy("c_mktsegment")
  }

  private def dsTypedJoin(s: SparkSession, d: String): DataFrame =
    typedJoin(t(s, d, "orders"), t(s, d, "customer"))

  private val oDsTypedJoin =
    s"""SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
       |  ${oSum4("o.o_totalprice")} AS total_price
       |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin

  val queries: Map[String, QFn] = Map(
    "chp_cuped_adjust"       -> chpCupedAdjust _,
    "mm_brightness_centroid" -> mmBrightnessCentroid _,
    "ds_typed_join"          -> dsTypedJoin _)

  val oracles: Map[String, String] = Map(
    "chp_cuped_adjust"       -> oChpCupedAdjust,
    "mm_brightness_centroid" -> oMmBrightnessCentroid,
    "ds_typed_join"          -> oDsTypedJoin)
}
