package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 76 (SURVEY §2.28):
  *
  *  - `ts_kalman_local_level`: local-level Kalman filter (q=1, r=4) per
  *    daily series — the optimal online smoother; oracle = sequential
  *    WITH RECURSIVE replay, engine = the bounded-series UDF pattern.
  *  - `agg_gumbel_maxima`: extreme-value analysis — Gumbel fit to
  *    weekly block maxima by method of moments + return levels; the
  *    capacity-planning tail estimate.
  *  - `dedup_tfidf_nn`: each document's nearest lexical neighbor by
  *    tf-idf cosine via the inverted-index self-join — the classical
  *    sparse-vector near-dup detector.
  */
object QRound9by extends QueryPack {

  private val dd = DoubleType

  // ---- ts_kalman_local_level ----

  /** Local-level Kalman filter, q=1 r=4, init (l=x_0, P=4): the exact
    * sequential recursion — engine side runs it as a per-series UDF
    * over the collected day array (bounded model state), oracle side
    * as a WITH RECURSIVE joining the indexed series; both execute the
    * IDENTICAL double operations in the identical order, so results
    * are bit-equal with no scale-to-long needed inside the loop.
    * Emits the final level, final covariance, and the innovation RMS.
    *
    * Scale shape: the daily rollup is the shuffle; the filter runs on
    * a days-long array per series. */
  private[graft] def kalmanStep(xs: Seq[Long]): Seq[Double] = {
    var l = xs.head.toDouble
    var p = 4.0
    var si = 0.0
    var i = 1
    while (i < xs.length) {
      val x = xs(i).toDouble
      val pp = p + 1.0
      val kk = pp / (pp + 4.0)
      val inn = x - l
      si = si + inn * inn
      l = l + kk * inn
      p = (1.0 - kk) * pp
      i += 1
    }
    Seq(l, p, si)
  }

  private[graft] def kalmanLocalLevel(s: SparkSession, d: String): DataFrame = {
    val daily = QRound9b.evDaily(s, d)
    val ser = daily.groupBy("event_type").agg(
      expr("transform(array_sort(collect_list(struct(day_num, cnt))), z -> z.cnt)")
        .as("vs"))
    val kU = udf((xs: Seq[Long]) => kalmanStep(xs))
    ser.select(col("event_type"), size(col("vs")).cast(LongType).as("n"),
        kU(col("vs")).as("st"))
      .select(col("event_type"), col("n"),
        trunc4(col("st").getItem(0)).as("level_final"),
        trunc6(col("st").getItem(1)).as("p_final"),
        trunc4(sqrt(col("st").getItem(2)
          / (col("n") - 1).cast(dd))).as("innovation_rms"))
      .orderBy("event_type")
  }

  private val oTsKalman =
    """WITH RECURSIVE daily AS (SELECT event_type,
      |    epoch_us(date_trunc('day', ts)) // 86400000000 AS day_num,
      |    count(*) AS cnt FROM events GROUP BY 1, 2),
      |idx AS MATERIALIZED (SELECT event_type, cnt AS x,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day_num)
      |      AS i FROM daily),
      |ln AS (SELECT event_type, count(*) AS n FROM daily GROUP BY 1),
      |k(event_type, i, l, p, si) AS (
      |  SELECT event_type, 1, CAST(x AS DOUBLE), 4e0, 0e0 FROM idx
      |  WHERE i = 1
      |  UNION ALL
      |  SELECT k.event_type, k.i + 1,
      |    k.l + (k.p + 1e0)/(k.p + 1e0 + 4e0) * (CAST(y.x AS DOUBLE) - k.l),
      |    (1e0 - (k.p + 1e0)/(k.p + 1e0 + 4e0)) * (k.p + 1e0),
      |    k.si + (CAST(y.x AS DOUBLE) - k.l)*(CAST(y.x AS DOUBLE) - k.l)
      |  FROM k JOIN idx y ON y.event_type = k.event_type
      |    AND y.i = k.i + 1)
      |SELECT k.event_type, CAST(ln.n AS BIGINT) AS n,
      |  floor(l*10000)/10000.0 AS level_final,
      |  floor(p*1000000)/1000000.0 AS p_final,
      |  floor(sqrt(si/CAST(ln.n - 1 AS DOUBLE))*10000)/10000.0
      |    AS innovation_rms
      |FROM k JOIN ln ON ln.event_type = k.event_type
      |WHERE k.i = ln.n ORDER BY k.event_type""".stripMargin

  // ---- agg_gumbel_maxima ----

  // Euler–Mascheroni and pi as shared literals (never engine builtins)
  private val gGamma = "5772156649015329e-16"
  private val gPi = "3141592653589793e-15"
  private val gBeta = s"sqrt(CAST(nw*sxx - sx*sx AS DOUBLE))" +
    s"/CAST(nw AS DOUBLE)*sqrt(6e0)/$gPi"
  private val gMu = s"CAST(sx AS DOUBLE)/CAST(nw AS DOUBLE) - $gGamma*beta"
  // Gumbel return level for period T weeks: mu - beta*ln(-ln(1 - 1/T))
  private def gRet(tw: Int) =
    s"mu - beta*ln(-ln(1e0 - 1e0/${tw}e0))"

  /** Gumbel extreme-value fit per event type: weekly block maxima of
    * the daily count (exact integers), method-of-moments μ/β through a
    * shared tower (γ and π as spelled literals, never engine builtins),
    * and the 4- and 12-week return levels — "what daily peak should we
    * provision for". Population variance via exact n·Σx²−(Σx)².
    *
    * Scale shape: one week rollup + one type rollup; the fit is
    * scalar. */
  private[graft] def gumbelMaxima(s: SparkSession, d: String): DataFrame = {
    val daily = QRound9b.evDaily(s, d)
    val weekly = daily.withColumn("wk", expr("day_num div 7"))
      .groupBy("event_type", "wk").agg(max("cnt").as("mx"))
    val m = weekly.groupBy("event_type").agg(count(lit(1)).as("nw"),
      sum("mx").as("sx"), sum(col("mx") * col("mx")).as("sxx"))
    m.withColumn("beta", expr(gBeta))
      .withColumn("mu", expr(gMu))
      .select(col("event_type"), col("nw").as("n_weeks"),
        trunc4(col("mu")).as("gumbel_mu"),
        trunc4(col("beta")).as("gumbel_beta"),
        trunc4(expr(gRet(4))).as("ret_level_4w"),
        trunc4(expr(gRet(12))).as("ret_level_12w"))
      .orderBy("event_type")
  }

  private val oAggGumbel =
    s"""WITH daily AS (SELECT event_type,
       |    epoch_us(date_trunc('day', ts)) // 86400000000 AS day_num,
       |    count(*) AS cnt FROM events GROUP BY 1, 2),
       |weekly AS (SELECT event_type, day_num // 7 AS wk, max(cnt) AS mx
       |  FROM daily GROUP BY 1, 2),
       |m AS (SELECT event_type, count(*) AS nw,
       |    CAST(sum(mx) AS BIGINT) AS sx, CAST(sum(mx*mx) AS BIGINT) AS sxx
       |  FROM weekly GROUP BY 1),
       |f1 AS (SELECT *, ($gBeta) AS beta FROM m),
       |f2 AS (SELECT *, ($gMu) AS mu FROM f1)
       |SELECT event_type, CAST(nw AS BIGINT) AS n_weeks,
       |  ${oTrunc4("mu")} AS gumbel_mu, ${oTrunc4("beta")} AS gumbel_beta,
       |  ${oTrunc4(gRet(4))} AS ret_level_4w,
       |  ${oTrunc4(gRet(12))} AS ret_level_12w
       |FROM f2 ORDER BY event_type""".stripMargin

  // ---- dedup_tfidf_nn ----

  /** Nearest lexical neighbor by tf-idf cosine: per-(doc,token) weight
    * w = tf·ln(N/df) scale-to-long'd at 1e6 (EXACT BIGINT vectors), dot
    * products via the inverted-index self-join on the token (only
    * co-occurring tokens generate work — the sparse-vector trick),
    * norms from the same weights, one double division per pair; each
    * doc reports its best neighbor by the exact 1e12-scaled cosine.
    *
    * Scale shape: the index join fans out by token document-frequency —
    * Σ_t df_t² partial products, the classical bound; norms broadcast.
    * At corpus scale rare-token blocking (drop ubiquitous tokens)
    * bounds the fan-out. */
  private[graft] def tfidfNn(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val tf = docs.select(col("doc_id"),
        explode(filter(split(col("text"), " "), x => x =!= "")).as("tk"))
      .groupBy("doc_id", "tk").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tk").agg(count(lit(1)).as("df"))
    val nd = docs.agg(count(lit(1)).as("nd"))
    val wv = tf.join(broadcast(df), "tk").crossJoin(broadcast(nd))
      .select(col("doc_id"), col("tk"), floor(
        col("tf").cast(dd)
          * log(col("nd").cast(dd) / col("df").cast(dd)) * lit(1e6)
          + lit(0.5)).cast(LongType).as("w"))
    val norms = wv.groupBy("doc_id").agg(sum(col("w") * col("w")).as("nn"))
    val a = wv.select(col("tk"), col("doc_id").as("da"), col("w").as("wa"))
    val b = wv.select(col("tk"), col("doc_id").as("db"), col("w").as("wb"))
    val dots = a.join(b, "tk").filter(col("da") < col("db"))
      .groupBy("da", "db").agg(sum(col("wa") * col("wb")).as("dot"))
    val na = norms.select(col("doc_id").as("da"), col("nn").as("na"))
    val nb = norms.select(col("doc_id").as("db"), col("nn").as("nb"))
    val cos = dots.join(broadcast(na), "da").join(broadcast(nb), "db")
      .withColumn("cos_sc", floor(
        col("dot").cast(dd) / (sqrt(col("na").cast(dd))
          * sqrt(col("nb").cast(dd))) * lit(1e12) + lit(0.5))
        .cast(LongType))
    val sym = cos.select(col("da").as("doc_id"), col("db").as("nbr"),
        col("cos_sc"))
      .union(cos.select(col("db").as("doc_id"), col("da").as("nbr"),
        col("cos_sc")))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("cos_sc").desc, col("nbr"))
    sym.withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
      .select(col("doc_id"), col("nbr").as("nearest_doc"),
        trunc4(col("cos_sc").cast(dd) / lit(1e12)).as("cosine"))
      .orderBy("doc_id")
  }

  private val oDedupTfidfNn =
    s"""WITH tf AS (SELECT doc_id, tk, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(list_filter(string_split(text, ' '),
       |      x -> x <> '')) AS tk FROM documents) GROUP BY 1, 2),
       |df AS (SELECT tk, count(*) AS df FROM tf GROUP BY 1),
       |nd AS (SELECT count(*) AS nd FROM documents),
       |wv AS (SELECT doc_id, tk, CAST(floor(CAST(tf AS DOUBLE)
       |    * ln(CAST(nd AS DOUBLE)/CAST(df AS DOUBLE)) * 1e6 + 5e-1)
       |    AS BIGINT) AS w
       |  FROM tf JOIN df USING (tk), nd),
       |norms AS (SELECT doc_id, CAST(sum(w*w) AS BIGINT) AS nn FROM wv
       |  GROUP BY 1),
       |dots AS (SELECT a.doc_id AS da, b.doc_id AS db,
       |    CAST(sum(a.w*b.w) AS BIGINT) AS dot
       |  FROM wv a JOIN wv b ON a.tk = b.tk AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |cos AS (SELECT da, db, CAST(floor(CAST(dot AS DOUBLE)
       |    /(sqrt(CAST(x.nn AS DOUBLE))*sqrt(CAST(y.nn AS DOUBLE)))
       |    * 1e12 + 5e-1) AS BIGINT) AS cos_sc
       |  FROM dots JOIN norms x ON x.doc_id = da
       |    JOIN norms y ON y.doc_id = db),
       |sym AS (SELECT da AS doc_id, db AS nbr, cos_sc FROM cos
       |  UNION ALL SELECT db, da, cos_sc FROM cos),
       |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
       |    ORDER BY cos_sc DESC, nbr) AS rnk FROM sym)
       |SELECT doc_id, nbr AS nearest_doc,
       |  ${oTrunc4("CAST(cos_sc AS DOUBLE)/1e12")} AS cosine
       |FROM r WHERE rnk = 1 ORDER BY doc_id""".stripMargin

  val queries: Map[String, QFn] = Map(
    "ts_kalman_local_level" -> ((s, d) => kalmanLocalLevel(s, d)),
    "agg_gumbel_maxima"     -> ((s, d) => gumbelMaxima(s, d)),
    "dedup_tfidf_nn"        -> ((s, d) => tfidfNn(s, d)))

  val oracles: Map[String, String] = Map(
    "ts_kalman_local_level" -> oTsKalman,
    "agg_gumbel_maxima"     -> oAggGumbel,
    "dedup_tfidf_nn"        -> oDedupTfidfNn)
}
