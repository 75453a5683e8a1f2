package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 extension wave 31 (SURVEY §2.28):
  *
  *  - `emb_hamming_topk`: binary-code nearest neighbours — sign-quantize
  *    every embedding into a 64-bit code (two packed BIGINT halves) and
  *    rank candidates by Hamming distance. The binary-retrieval trick:
  *    a 16× smaller index scanned with XOR+popcount instead of float
  *    dot products.
  *  - `graph_bipartite_project`: project the user×item bipartite
  *    engagement graph onto item-item co-engagement edges (weight =
  *    #users engaging both) — the item-similarity graph collaborative
  *    filters and co-view widgets are built from.
  *  - `profile_benford`: first-significant-digit distribution of a
  *    money column vs Benford's law — the classic synthetic-data /
  *    fraud data-quality audit.
  */
object QRound9af extends QueryPack {

  // ---- emb_hamming_topk ----

  private val hamProbeIds = Seq(2L, 5L, 13L, 17L, 23L)
  private val hamK = 5

  /** Pack sign bits of dims 1..32 / 33..64 into two BIGINTs. Kept as two
    * halves so no bit ever lands in the BIGINT sign position — `hi`/`lo`
    * stay non-negative and XOR/popcount semantics are identical in both
    * engines. */
  private def signCode(dimOffset: Int): org.apache.spark.sql.Column =
    expr(s"""aggregate(
      zip_with(slice(embedding, $dimOffset, 32), sequence(1, 32),
        (e, i) -> IF(e > 0, shiftleft(1L, i - 1), 0L)),
      0L, (a, x) -> a + x)""")

  /** Binary ANN: 64-bit sign codes + Hamming top-k for 5 probe vectors.
    *
    * Scale shape: the code table is 16 B/vector (vs 256 B of floats) —
    * the index scan is 16× lighter than brute-force cosine; probes
    * broadcast against it (the corpus side never shuffles); XOR+popcount
    * is codegen'd integer math; per-probe ranking partitions by qid so
    * no global window. At deployment the code table is the thing you
    * pin in memory; re-rank survivors with exact cosine if needed. */
  private[graft] def hammingTopK(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val codes = t(s, d, "embeddings")
      .select(col("vec_id"), signCode(1).as("hi"), signCode(33).as("lo"))
    val probes = codes.filter(col("vec_id").isin(hamProbeIds: _*))
      .select(col("vec_id").as("qid"), col("hi").as("qhi"),
        col("lo").as("qlo"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qid")
      .orderBy(col("ham"), col("vec_id"))
    codes.join(broadcast(probes), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (bit_count(col("hi").bitwiseXOR(col("qhi"))) +
          bit_count(col("lo").bitwiseXOR(col("qlo"))))
          .cast(LongType).as("ham"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= hamK)
      .select(col("qid"), col("rnk").cast(LongType).as("rnk"),
        col("vec_id"), col("ham"))
      .orderBy("qid", "rnk")
  }

  private val oEmbHammingTopk =
    s"""WITH codes AS (SELECT vec_id,
       |    list_sum(list_transform(embedding, (e, i) -> CASE
       |      WHEN e > 0 AND i <= 32 THEN (CAST(1 AS BIGINT) << CAST(i - 1 AS INT))
       |      ELSE 0 END)) AS hi,
       |    list_sum(list_transform(embedding, (e, i) -> CASE
       |      WHEN e > 0 AND i > 32 THEN (CAST(1 AS BIGINT) << CAST(i - 33 AS INT))
       |      ELSE 0 END)) AS lo
       |  FROM embeddings),
       |probes AS (SELECT vec_id AS qid, hi AS qhi, lo AS qlo FROM codes
       |  WHERE vec_id IN (${hamProbeIds.mkString(", ")})),
       |sc AS (SELECT p.qid, c.vec_id,
       |    CAST(bit_count(xor(c.hi, p.qhi)) + bit_count(xor(c.lo, p.qlo))
       |      AS BIGINT) AS ham
       |  FROM codes c, probes p WHERE c.vec_id <> p.qid),
       |r AS (SELECT qid, vec_id, ham, row_number() OVER (
       |    PARTITION BY qid ORDER BY ham, vec_id) AS rnk FROM sc)
       |SELECT qid, CAST(rnk AS BIGINT) AS rnk, vec_id, ham
       |FROM r WHERE rnk <= $hamK ORDER BY qid, rnk""".stripMargin

  // ---- graph_bipartite_project ----

  private val bipCap = 48
  private val bipMinW = 3L

  /** Item-item co-engagement projection of the user×item bipartite graph
    * (item = the event's `props.k` slot): weight = #users engaging both
    * items, kept at weight ≥ 3.
    *
    * Scale shape: per-user item sets are df-capped at 48 (deterministic
    * md5 rank — a super-user contributes at most C(48,2) = 1128 pairs,
    * so the pair space is O(users · cap²) no matter how skewed
    * engagement is); the pair generator is a self equi-join on the
    * user key (never a cartesian); pair counts partial-aggregate
    * map-side on the bounded item×item key domain.
    *
    * Plan shape (r13 rework, VERDICT r12 #5): the item slot is pulled
    * with a compiled-regex field extract instead of `get_json_object` —
    * the payloads are single-key objects and a JSON AST parse per row
    * was ~5× the extract cost AND the whole key's largest term; dedup +
    * md5 cap happen inside ONE user-keyed aggregate (collect_set of
    * (rank, k) structs, array_sort, slice) instead of a distinct
    * exchange plus a window exchange, and the pair self-join reuses
    * that aggregate's partitioning — 2 exchanges end to end where the
    * old plan had 4. */
  private[graft] def bipartiteProject(events: DataFrame): DataFrame = {
    val ui = events
      .select(col("user_id"),
        regexp_extract(col("props"), "\"k\"\\s*:\\s*(-?\\d+)", 1)
          .as("ks"))
      .filter(col("ks") =!= "")
      .select(col("user_id"), col("ks").cast(IntegerType).as("k"))
    val capped = ui
      .withColumn("r", md5(concat_ws(":", col("user_id"), col("k"))))
      .groupBy("user_id")
      .agg(expr(
        s"""slice(transform(array_sort(collect_set(struct(r, k))),
           |  z -> z.k), 1, $bipCap)""".stripMargin).as("items"))
    val ex = capped.select(col("user_id"), explode(col("items")).as("k"))
    val a = ex.select(col("user_id"), col("k").as("k1"))
    val b = ex.select(col("user_id"), col("k").as("k2"))
    a.join(b, Seq("user_id"))
      .filter(col("k1") < col("k2"))
      .groupBy("k1", "k2")
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= bipMinW)
      .orderBy(col("w").desc, col("k1"), col("k2"))
  }

  private def graphBipartiteProject(s: SparkSession, d: String): DataFrame =
    bipartiteProject(t(s, d, "events"))

  private val oGraphBipartiteProject =
    s"""WITH ui AS (SELECT DISTINCT user_id,
       |    CAST(json_extract(props, '$$.k') AS INTEGER) AS k
       |  FROM events WHERE json_extract(props, '$$.k') IS NOT NULL),
       |capped AS (SELECT user_id, k FROM (
       |    SELECT user_id, k, row_number() OVER (PARTITION BY user_id
       |      ORDER BY md5(CAST(user_id AS VARCHAR) || ':' ||
       |        CAST(k AS VARCHAR)), k) AS r
       |    FROM ui) WHERE r <= $bipCap)
       |SELECT a.k AS k1, b.k AS k2, CAST(count(*) AS BIGINT) AS w
       |FROM capped a JOIN capped b
       |  ON a.user_id = b.user_id AND a.k < b.k
       |GROUP BY 1, 2 HAVING count(*) >= $bipMinW
       |ORDER BY w DESC, k1, k2""".stripMargin

  // ---- profile_benford ----

  /** Benford's-law expected share of each first significant digit,
    * hardcoded to 5 dp so both engines compare against the identical
    * literal (log10 differences can round differently). */
  private val benford: Seq[(Int, Double)] = Seq(
    1 -> 0.30103, 2 -> 0.17609, 3 -> 0.12494, 4 -> 0.09691,
    5 -> 0.07918, 6 -> 0.06695, 7 -> 0.05799, 8 -> 0.05115, 9 -> 0.04576)

  /** First-significant-digit audit of `l_extendedprice` vs Benford's law.
    * Digits come from exact integer cents (DECIMAL(12,2) × 100 — no
    * float re-rounding), so the digit extraction is bit-identical in
    * both engines; shares trunc4 against hardcoded expected literals.
    *
    * Scale shape: one map pass + a 9-cell aggregate; the grand total
    * joins back as a broadcast scalar (never an unpartitioned window). */
  private[graft] def benfordProfile(lineitem: DataFrame): DataFrame = {
    val cents = lineitem.select(
      substring((money(col("l_extendedprice")) * lit(100))
        .cast(LongType).cast(StringType), 1, 1)
        .cast(IntegerType).as("digit"))
    val counts = cents.groupBy("digit").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    val expected = benford.tail.foldLeft(
      when(col("digit") === benford.head._1, benford.head._2)) {
      case (acc, (dd, p)) => acc.when(col("digit") === dd, p)
    }
    counts.join(broadcast(total))
      .select(col("digit"), col("n"),
        trunc4(col("n").cast(DoubleType) / col("total").cast(DoubleType))
          .as("share"),
        expected.as("expected"))
      .withColumn("abs_dev", trunc4(abs(col("share") - col("expected"))))
      .orderBy("digit")
  }

  private def profileBenford(s: SparkSession, d: String): DataFrame =
    benfordProfile(t(s, d, "lineitem"))

  private val oProfileBenford = {
    val expCase = benford.map { case (dd, p) => s"WHEN $dd THEN $p" }
      .mkString(" ")
    s"""WITH cents AS (SELECT CAST(substr(CAST(CAST(
       |      CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
       |      AS VARCHAR), 1, 1) AS INTEGER) AS digit FROM lineitem),
       |counts AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
       |  FROM cents GROUP BY 1),
       |tot AS (SELECT sum(n) AS total FROM counts),
       |j AS (SELECT digit, n,
       |    ${oTrunc4("CAST(n AS DOUBLE) / CAST(total AS DOUBLE)")} AS share,
       |    CASE digit $expCase END AS expected
       |  FROM counts, tot)
       |SELECT digit, n, share, expected,
       |  ${oTrunc4("abs(share - expected)")} AS abs_dev
       |FROM j ORDER BY digit""".stripMargin
  }

  val queries: Map[String, QFn] = Map(
    "emb_hamming_topk"        -> hammingTopK _,
    "graph_bipartite_project" -> graphBipartiteProject _,
    "profile_benford"         -> profileBenford _)

  val oracles: Map[String, String] = Map(
    "emb_hamming_topk"        -> oEmbHammingTopk,
    "graph_bipartite_project" -> oGraphBipartiteProject,
    "profile_benford"         -> oProfileBenford)
}
