package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 80 (SURVEY §2.28):
  *
  *  - `chp_markov_removal`: Markov removal-effect attribution — the
  *    other standard data-driven attribution (beside the Shapley key):
  *    how much does conversion probability drop when a channel's state
  *    is knocked out of the journey chain.
  *  - `ts_season_length_detect`: season-length detection per series via
  *    the exact-integer ACF argmax over candidate lags.
  *  - `agg_trimmed_mean`: trimmed + winsorized means per order priority
  *    — the robust-location pair on the money column.
  */
object QRound9cc extends QueryPack {

  private val dd = DoubleType
  private val T12 = 1000000000000L
  private val mrRounds = 4
  private val mrChannels = Seq("click", "error", "signup", "view")

  // ---- chp_markov_removal ----

  /** Removal-effect attribution: the journey chain (next-action
    * transitions, purchase absorbing at T=1e12) is V²-bounded collected
    * model state; reach probability is the 4-round EXACT integer
    * iteration (the `chp_absorbing_prob` discipline), run once intact
    * and once per channel with that channel's state pinned to 0 (paths
    * through it die). Conversion is measured from the observed
    * first-touch distribution; attribution share = each channel's
    * probability drop over the total drop (one trunc4'd division).
    *
    * Scale shape: one windowed transition rollup + one first-touch
    * rollup are the only distributed work; 5 × 4 rounds of pure long
    * arithmetic on ≤25 collected cells. */
  private[graft] def markovRemoval(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val trans = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("cnt"))
    val cells = trans.collect().map(r => (r.getAs[String]("from_type"),
      r.getAs[String]("to_type"), r.getAs[Long]("cnt")))
    val tot = cells.groupBy(_._1).map { case (s0, xs) =>
      s0 -> xs.map(_._3).sum }
    val states = events.select(col("event_type").as("state")).distinct()
      .collect().map(_.getAs[String]("state")).sorted
    val firsts = events
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy("event_type").agg(count(lit(1)).as("wgt"))
      .collect().map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("wgt"))).toMap
    val nUsers = firsts.values.sum

    def hitProb(removed: Option[String]): Map[String, Long] = {
      var p = states.map(s0 =>
        s0 -> (if (s0 == "purchase") T12 else 0L)).toMap
      for (_ <- 1 to mrRounds) {
        p = states.map { s0 =>
          s0 -> (if (s0 == "purchase") T12
          else if (removed.contains(s0)) 0L
          else tot.get(s0) match {
            case Some(tt) if tt > 0 =>
              cells.filter(_._1 == s0)
                .map { case (_, t2, c) => c * p(t2) }.sum / tt
            case _ => 0L
          })
        }.toMap
      }
      p
    }
    def overall(p: Map[String, Long]): Long =
      states.map(s0 => firsts.getOrElse(s0, 0L) * p(s0)).sum / nUsers

    val pFull = overall(hitProb(None))
    val drops = mrChannels.map(c => c -> (pFull - overall(hitProb(Some(c)))))
    val totalDrop = drops.map(_._2).sum
    val spark = events.sparkSession
    import spark.implicits._
    drops.map { case (c, drop) =>
      (c, pFull, drop, totalDrop)
    }.toDF("channel", "p_full_sc", "drop_sc", "total_drop_sc")
      .select(col("channel"),
        trunc6(col("p_full_sc").cast(dd) / lit(1e12)).as("p_conversion"),
        trunc6(col("drop_sc").cast(dd) / lit(1e12)).as("removal_effect"),
        trunc4(col("drop_sc").cast(dd)
          / nullif(col("total_drop_sc").cast(dd), lit(0.0)))
          .as("attribution_share"))
      .orderBy("channel")
  }

  private def chpMarkovRemoval(s: SparkSession, d: String): DataFrame =
    markovRemoval(t(s, d, "events"))

  private val oChpMarkovRemoval = {
    // per-variant unrolled iteration: v = F (full) or the removed channel
    def rounds(tag: String, removed: Option[String]) = {
      val base =
        s"""p${tag}0 AS (SELECT state, CASE WHEN state = 'purchase'
           |  THEN $T12 ELSE 0 END AS p12 FROM states)""".stripMargin
      val iters = (1 to mrRounds).map { k =>
        val removedCase = removed
          .map(c => s"WHEN s.state = '$c' THEN 0").getOrElse("")
        s"""p$tag$k AS MATERIALIZED (SELECT s.state,
           |    CASE WHEN s.state = 'purchase' THEN $T12 $removedCase
           |      ELSE coalesce(st.p12, 0) END AS p12
           |  FROM states s LEFT JOIN (
           |    SELECT t.from_type AS state,
           |      CAST(sum(t.cnt * p.p12) AS BIGINT) // tt.tot AS p12
           |    FROM trans t JOIN p$tag${k - 1} p ON p.state = t.to_type
           |    JOIN totals tt ON tt.from_type = t.from_type
           |    GROUP BY t.from_type, tt.tot) st ON st.state = s.state)"""
          .stripMargin
      }
      (base +: iters).mkString(",\n")
    }
    def ov(tag: String) =
      s"""ov$tag AS (SELECT CAST(sum(fw.w * p.p12) AS BIGINT)
         |  // (SELECT n_users FROM nu) AS pov
         |  FROM fw JOIN p$tag$mrRounds p ON p.state = fw.state)""".stripMargin
    val variantTags = mrChannels.zipWithIndex.map { case (c, i) => (s"r$i", c) }
    val allRounds = (rounds("f", None) +:
      variantTags.map { case (tg, c) => rounds(tg, Some(c)) }).mkString(",\n")
    val allOv = (ov("f") +: variantTags.map(v => ov(v._1))).mkString(",\n")
    val perChannel = variantTags.map { case (tg, c) =>
      s"""SELECT '$c' AS channel,
         |  (SELECT pov FROM ovf) AS p_full_sc,
         |  (SELECT pov FROM ovf) - (SELECT pov FROM ov$tg) AS drop_sc"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type
       |  FROM events),
       |seq AS (SELECT event_type AS from_type, lead(event_type) OVER
       |    (PARTITION BY user_id ORDER BY us, event_id) AS to_type FROM e),
       |trans AS MATERIALIZED (SELECT from_type, to_type, count(*) AS cnt
       |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
       |totals AS (SELECT from_type, CAST(sum(cnt) AS BIGINT) AS tot
       |  FROM trans GROUP BY 1),
       |states AS (SELECT DISTINCT event_type AS state FROM events),
       |fw AS (SELECT event_type AS state, count(*) AS w FROM (
       |    SELECT user_id, event_type, row_number() OVER
       |      (PARTITION BY user_id ORDER BY us, event_id) AS rn FROM e)
       |  WHERE rn = 1 GROUP BY 1),
       |nu AS (SELECT CAST(sum(w) AS BIGINT) AS n_users FROM fw),
       |$allRounds,
       |$allOv,
       |ch AS ($perChannel),
       |td AS (SELECT CAST(sum(drop_sc) AS BIGINT) AS total_drop FROM ch)
       |SELECT channel,
       |  floor(CAST(p_full_sc AS DOUBLE)/1e12*1000000)/1000000.0
       |    AS p_conversion,
       |  floor(CAST(drop_sc AS DOUBLE)/1e12*1000000)/1000000.0
       |    AS removal_effect,
       |  floor(CAST(drop_sc AS DOUBLE)
       |    /nullif(CAST((SELECT total_drop FROM td) AS DOUBLE), 0e0)
       |    *10000)/10000.0 AS attribution_share
       |FROM ch ORDER BY channel""".stripMargin
  }

  // ---- ts_season_length_detect ----

  /** Season-length detection: exact-integer ACF numerators (n·x − Σx
    * centering — BIGINT products) for lags 2..10 share one denominator,
    * so the argmax lag is an EXACT integer comparison (tie → smaller
    * lag); reports the winning lag, its correlation, and the weekly
    * (lag-7) correlation for reference.
    *
    * Scale shape: per-type lead windows + one rollup. */
  private[graft] def seasonLengthDetect(s: SparkSession, d: String): DataFrame = {
    val daily = QRound9b.evDaily(s, d)
    val st = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum("cnt").as("stot"))
    val c = daily.join(broadcast(st), "event_type")
      .select(col("event_type"), col("day_num"), col("n_days"),
        (col("n_days") * col("cnt") - col("stot")).as("c"))
    val w = Window.partitionBy("event_type").orderBy("day_num")
    val led = (2 to 10).foldLeft(c) { (df, k) =>
      df.withColumn(s"c$k", lead("c", k).over(w))
    }
    val aggs = Seq(sum(col("c") * col("c")).as("den")) ++
      (2 to 10).map(k => sum(col("c") * col(s"c$k")).as(s"num$k"))
    val m = led.groupBy("event_type", "n_days").agg(aggs.head, aggs.tail: _*)
    val best = m.withColumn("nums",
        array((2 to 10).map(k => col(s"num$k")): _*))
      .withColumn("best_idx", expr(
        "array_position(nums, array_max(nums))"))
      .withColumn("best_lag", (col("best_idx") + 1).cast(IntegerType))
    best.select(col("event_type"), col("n_days"),
        col("best_lag"),
        trunc4(element_at(col("nums"), col("best_idx").cast(IntegerType))
          .cast(dd) / nullif(col("den").cast(dd), lit(0.0)))
          .as("acf_best"),
        trunc4(col("num7").cast(dd) / nullif(col("den").cast(dd), lit(0.0)))
          .as("acf_week"))
      .orderBy("event_type")
  }

  private val oTsSeasonLength = {
    val leads = (2 to 10).map(k =>
      s"lead(c, $k) OVER w AS c$k").mkString(", ")
    val nums = (2 to 10).map(k =>
      s"CAST(sum(c*c$k) AS BIGINT) AS num$k").mkString(", ")
    s"""WITH daily AS (SELECT event_type,
       |    epoch_us(date_trunc('day', ts)) // 86400000000 AS day_num,
       |    count(*) AS cnt FROM events GROUP BY 1, 2),
       |st AS (SELECT event_type, count(*) AS n_days,
       |    CAST(sum(cnt) AS BIGINT) AS stot FROM daily GROUP BY 1),
       |c AS (SELECT d.event_type, day_num, n_days,
       |    (n_days*cnt - stot) AS c FROM daily d JOIN st USING (event_type)),
       |led AS (SELECT event_type, n_days, c, $leads
       |  FROM c WINDOW w AS (PARTITION BY event_type ORDER BY day_num)),
       |m AS (SELECT event_type, n_days, CAST(sum(c*c) AS BIGINT) AS den,
       |    $nums FROM led GROUP BY 1, 2),
       |b AS (SELECT *, [${(2 to 10).map(k => s"num$k").mkString(", ")}]
       |    AS nums FROM m),
       |bi AS (SELECT *, list_position(nums, list_max(nums)) AS best_idx
       |  FROM b)
       |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       |  CAST(best_idx + 1 AS INT) AS best_lag,
       |  ${oTrunc4("CAST(nums[best_idx] AS DOUBLE)/nullif(CAST(den AS DOUBLE), 0e0)")}
       |    AS acf_best,
       |  ${oTrunc4("CAST(num7 AS DOUBLE)/nullif(CAST(den AS DOUBLE), 0e0)")}
       |    AS acf_week
       |FROM bi ORDER BY event_type""".stripMargin
  }

  // ---- agg_trimmed_mean ----

  /** Trimmed (middle 80%) and winsorized (clamped at p10/p90) means of
    * order totalprice per priority: exact interpolated percentiles,
    * per-value scale-to-long at 1e4 so the clamped/trimmed sums are
    * exact BIGINTs, one division each at the end, beside the exact
    * cent-scaled raw mean.
    *
    * Scale shape: one percentile aggregate broadcast back + one
    * counting pass — the Tukey-fences dataflow. */
  private[graft] def trimmedMean(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
    // one array-percentile call — see ts_gap_percentiles (r16)
    val q = o.groupBy("o_orderpriority")
      .agg(expr("percentile(o_totalprice, array(1e-1, 9e-1))").as("ps"))
      .select(col("o_orderpriority"),
        element_at(col("ps"), 1).as("p10"),
        element_at(col("ps"), 2).as("p90"))
    o.join(broadcast(q), "o_orderpriority")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * lit(100) + lit(0.5))
          .cast(LongType)).as("cents"),
        sum(when(col("o_totalprice") >= col("p10")
          && col("o_totalprice") <= col("p90"), 1L).otherwise(0L))
          .as("n_trim"),
        sum(when(col("o_totalprice") >= col("p10")
          && col("o_totalprice") <= col("p90"),
          floor(col("o_totalprice") * lit(1e4) + lit(0.5)).cast(LongType))
          .otherwise(0L)).as("trim_sc"),
        sum(floor(greatest(least(col("o_totalprice"), col("p90")),
          col("p10")) * lit(1e4) + lit(0.5)).cast(LongType))
          .as("win_sc"))
      .select(col("o_orderpriority"), col("n"), col("n_trim"),
        trunc4(col("cents").cast(dd) / lit(1e2) / col("n").cast(dd))
          .as("raw_mean"),
        trunc4(col("trim_sc").cast(dd) / lit(1e4)
          / col("n_trim").cast(dd)).as("trimmed_mean"),
        trunc4(col("win_sc").cast(dd) / lit(1e4) / col("n").cast(dd))
          .as("winsorized_mean"))
      .orderBy("o_orderpriority")
  }

  private val oAggTrimmedMean =
    s"""WITH q AS (SELECT o_orderpriority,
       |    quantile_cont(o_totalprice, 1e-1) AS p10,
       |    quantile_cont(o_totalprice, 9e-1) AS p90
       |  FROM orders GROUP BY 1),
       |j AS (SELECT o.o_orderpriority, o_totalprice, p10, p90
       |  FROM orders o JOIN q USING (o_orderpriority)),
       |m AS (SELECT o_orderpriority, count(*) AS n,
       |    CAST(sum(CAST(floor(o_totalprice*100 + 5e-1) AS BIGINT))
       |      AS BIGINT) AS cents,
       |    CAST(sum(CASE WHEN o_totalprice >= p10 AND o_totalprice <= p90
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_trim,
       |    CAST(sum(CASE WHEN o_totalprice >= p10 AND o_totalprice <= p90
       |      THEN CAST(floor(o_totalprice*1e4 + 5e-1) AS BIGINT) ELSE 0
       |      END) AS BIGINT) AS trim_sc,
       |    CAST(sum(CAST(floor(greatest(least(o_totalprice, p90), p10)*1e4
       |      + 5e-1) AS BIGINT)) AS BIGINT) AS win_sc
       |  FROM j GROUP BY 1)
       |SELECT o_orderpriority, n, n_trim,
       |  ${oTrunc4("CAST(cents AS DOUBLE)/1e2/CAST(n AS DOUBLE)")}
       |    AS raw_mean,
       |  ${oTrunc4("CAST(trim_sc AS DOUBLE)/1e4/CAST(n_trim AS DOUBLE)")}
       |    AS trimmed_mean,
       |  ${oTrunc4("CAST(win_sc AS DOUBLE)/1e4/CAST(n AS DOUBLE)")}
       |    AS winsorized_mean
       |FROM m ORDER BY o_orderpriority""".stripMargin

  val queries: Map[String, QFn] = Map(
    "chp_markov_removal"      -> chpMarkovRemoval _,
    "ts_season_length_detect" -> ((s, d) => seasonLengthDetect(s, d)),
    "agg_trimmed_mean"        -> ((s, d) => trimmedMean(s, d)))

  val oracles: Map[String, String] = Map(
    "chp_markov_removal"      -> oChpMarkovRemoval,
    "ts_season_length_detect" -> oTsSeasonLength,
    "agg_trimmed_mean"        -> oAggTrimmedMean)
}
