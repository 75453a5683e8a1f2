package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Round-9 extension wave 38 (SURVEY §2.28):
  *
  *  - `text_minhash_estimate`: MinHash Jaccard-estimator calibration —
  *    per LSH candidate pair, the 16-perm signature estimate vs the
  *    exact Jaccard and the absolute error (the audit that justifies a
  *    signature width before a 100 TB dedup run).
  *  - `graph_component_sizes`: component-size histogram + node share of
  *    the dup graph — the "how big is the giant component" readout that
  *    decides whether transitive dedup is safe.
  *  - `ts_gap_percentiles`: inter-event gap percentiles per event type —
  *    the latency/cadence distribution an eventing SLO tracks.
  */
object QRound9am extends QueryPack {

  // ---- text_minhash_estimate ----

  private val estPerms = 16

  /** Per LSH-candidate pair: MinHash estimate (share of 16 seeded-md5
    * min-signatures that agree — granularity 1/16), exact Jaccard over
    * distinct word sets, absolute error. Both statistics are exact
    * integer ratios trunc4'd once.
    *
    * Scale shape: signatures are one tokenize-explode pass with
    * map-side min-combine (16 mins per doc ride one shuffle row);
    * the exact-Jaccard join is PAIR-SCOPED (only LSH candidates, never
    * all pairs); the intersection join keys on (word) within the
    * bounded candidate set. */
  private[graft] def minhashEstimate(s: SparkSession, d: String): DataFrame = {
    // shared per-corpus distinct (doc_id, word) memo — consumed 4× below
    // (signatures, sizes, both intersection sides); see QText.docWordsPersisted
    val words = QText.docWordsPersisted(s, d)
    val sigCols: Seq[Column] = (0 until estPerms).map { k =>
      min(md5(concat(lit(s"e$k|"), col("word")).cast(BinaryType)))
        .as(s"sig$k")
    }
    val sigs = words.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    val sizes = words.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val pairs = QText.lshPairsPersisted(s, d).select("a_id", "b_id")
    val wa = words.select(col("doc_id").as("a_id"), col("word"))
    val wb = words.select(col("doc_id").as("b_id"), col("word"))
    val inter = pairs.join(wa, Seq("a_id")).join(wb, Seq("b_id", "word"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
    val matches = (0 until estPerms).map { k =>
      (col(s"a.sig$k") === col(s"b.sig$k")).cast(LongType)
    }.reduce(_ + _)
    val est = pairs
      .join(sigs.as("a"), col("a_id") === col("a.doc_id"))
      .join(sigs.as("b"), col("b_id") === col("b.doc_id"))
      .select(col("a_id"), col("b_id"),
        trunc4(matches.cast(DoubleType) / lit(estPerms.toDouble)).as("est"))
    est
      .join(inter, Seq("a_id", "b_id"), "left_outer")
      .join(sizes.select(col("doc_id").as("a_id"), col("sz").as("sa")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("sz").as("sb")), "b_id")
      .select(col("a_id"), col("b_id"), col("est"),
        trunc4(coalesce(col("inter"), lit(0L)).cast(DoubleType) /
          (col("sa") + col("sb") - coalesce(col("inter"), lit(0L)))
            .cast(DoubleType)).as("jac"))
      .withColumn("abs_err", trunc4(abs(col("est") - col("jac"))))
      .orderBy("a_id", "b_id")
  }

  private val oTextMinhashEstimate = {
    val oPairs = QText.oracles("dedup_lsh_pairs")
    val sigExprs = (0 until estPerms)
      .map(k => s"min(md5('e$k|' || word)) AS sig$k").mkString(", ")
    val matchSum = (0 until estPerms)
      .map(k => s"CASE WHEN sa.sig$k = sb.sig$k THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH words AS (SELECT DISTINCT doc_id,
       |    unnest(string_split(text, ' ')) AS word FROM documents),
       |sigs AS (SELECT doc_id, $sigExprs FROM words GROUP BY doc_id),
       |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
       |  FROM words GROUP BY doc_id),
       |pairs AS (SELECT a_id, b_id FROM ($oPairs)),
       |inter AS (SELECT p.a_id, p.b_id, CAST(count(*) AS BIGINT) AS i
       |  FROM pairs p
       |    JOIN words wa ON wa.doc_id = p.a_id
       |    JOIN words wb ON wb.doc_id = p.b_id AND wb.word = wa.word
       |  GROUP BY 1, 2)
       |SELECT p.a_id, p.b_id,
       |  ${oTrunc4(s"CAST($matchSum AS DOUBLE) / $estPerms")} AS est,
       |  ${oTrunc4("CAST(coalesce(i.i, 0) AS DOUBLE) / (za.sz + zb.sz - coalesce(i.i, 0))")} AS jac,
       |  ${oTrunc4(s"abs(${oTrunc4(s"CAST($matchSum AS DOUBLE) / $estPerms")} - ${oTrunc4("CAST(coalesce(i.i, 0) AS DOUBLE) / (za.sz + zb.sz - coalesce(i.i, 0))")})")} AS abs_err
       |FROM pairs p
       |  JOIN sigs sa ON sa.doc_id = p.a_id
       |  JOIN sigs sb ON sb.doc_id = p.b_id
       |  JOIN sizes za ON za.doc_id = p.a_id
       |  JOIN sizes zb ON zb.doc_id = p.b_id
       |  LEFT JOIN inter i ON i.a_id = p.a_id AND i.b_id = p.b_id
       |ORDER BY p.a_id, p.b_id""".stripMargin
  }

  // ---- graph_component_sizes ----

  /** Component-size histogram of the near-dup graph (including the
    * singleton docs no pair touches): per size, component count and the
    * node share of the corpus — the giant-component sanity readout
    * before trusting transitive dedup.
    *
    * Scale shape: composes the declared CC key (memoized propagation);
    * the histogram is two bounded aggregates; corpus total broadcasts
    * as a scalar. */
  private[graft] def componentSizes(s: SparkSession, d: String): DataFrame = {
    val cc = QRound4.queries("dedup_cc_cluster")(s, d)
      .select("doc_id", "cluster_id")
    val comps = cc.groupBy("cluster_id").agg(count(lit(1)).as("size"))
    val total = cc.agg(count(lit(1)).as("total"))
    comps.groupBy("size").agg(count(lit(1)).as("n_comp"))
      .join(broadcast(total))
      .select(col("size"), col("n_comp"),
        trunc4((col("size") * col("n_comp")).cast(DoubleType) /
          col("total").cast(DoubleType)).as("node_share"))
      .orderBy("size")
  }

  private val oGraphComponentSizes = {
    val oCc = QRound4.oracles("dedup_cc_cluster")
    s"""WITH cc AS (SELECT doc_id, cluster_id FROM ($oCc)),
       |comps AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS size
       |  FROM cc GROUP BY 1),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM cc)
       |SELECT size, CAST(count(*) AS BIGINT) AS n_comp,
       |  ${oTrunc4("CAST(size * count(*) AS DOUBLE) / any_value(total)")} AS node_share
       |FROM comps, tot GROUP BY size, total ORDER BY size""".stripMargin
  }

  // ---- ts_gap_percentiles ----

  /** Inter-event gap distribution per type: exact interpolated P50/P90/
    * P99 of the gap (seconds, trunc4), gap count and max — the cadence
    * profile an eventing SLO tracks. Gaps are exact integer micros;
    * the percentile interpolation runs on identical integers in both
    * engines.
    *
    * Scale shape: the lag window partitions by event type; percentiles
    * are one bounded aggregate per type. */
  private[graft] def gapPercentiles(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("us", "event_id")
    events
      .select(col("event_type"), col("event_id"),
        expr("unix_micros(cast(ts as timestamp))").as("us"))
      .withColumn("gap_us", col("us") - lag("us", 1).over(w))
      .filter(col("gap_us").isNotNull)
      .groupBy("event_type")
      // ONE array-percentile aggregate (OPTIMIZATION r16): the three
      // scalar percentile() calls each built a per-group counts map
      // over the 500k gaps; the array form builds it once — identical
      // interpolation, identical values.
      .agg(count(lit(1)).as("n_gaps"),
        expr("percentile(gap_us, array(0.5, 0.9, 0.99))").as("ps"),
        trunc4(max("gap_us").cast(DoubleType) / lit(1e6)).as("max_s"))
      .select(col("event_type"), col("n_gaps"),
        trunc4(element_at(col("ps"), 1) / lit(1e6)).as("p50_s"),
        trunc4(element_at(col("ps"), 2) / lit(1e6)).as("p90_s"),
        trunc4(element_at(col("ps"), 3) / lit(1e6)).as("p99_s"),
        col("max_s"))
      .orderBy("event_type")
  }

  private def tsGapPercentiles(s: SparkSession, d: String): DataFrame =
    gapPercentiles(t(s, d, "events"))

  private val oTsGapPercentiles =
    s"""WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS us
       |  FROM events),
       |g AS (SELECT event_type,
       |    us - lag(us) OVER (PARTITION BY event_type
       |      ORDER BY us, event_id) AS gap_us
       |  FROM e)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
       |  ${oTrunc4("quantile_cont(gap_us, 5e-1) / 1e6")} AS p50_s,
       |  ${oTrunc4("quantile_cont(gap_us, 9e-1) / 1e6")} AS p90_s,
       |  ${oTrunc4("quantile_cont(gap_us, 99e-2) / 1e6")} AS p99_s,
       |  ${oTrunc4("CAST(max(gap_us) AS DOUBLE) / 1e6")} AS max_s
       |FROM g WHERE gap_us IS NOT NULL
       |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, QFn] = Map(
    "text_minhash_estimate" -> minhashEstimate _,
    "graph_component_sizes" -> componentSizes _,
    "ts_gap_percentiles"    -> tsGapPercentiles _)

  val oracles: Map[String, String] = Map(
    "text_minhash_estimate" -> oTextMinhashEstimate,
    "graph_component_sizes" -> oGraphComponentSizes,
    "ts_gap_percentiles"    -> oTsGapPercentiles)
}
