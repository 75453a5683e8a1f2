package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-5 ninth wave (SURVEY §2.22) — two surfaces nothing else covers:
  *
  *  - `text_dedup_paragraph`: SUB-document dedup — whole-doc dedup
  *    (text_dedup_exact/minhash/lsh) misses boilerplate passages shared
  *    ACROSS distinct documents; this key fingerprints non-overlapping
  *    16-token chunks and reports, per document, how much of it exists
  *    verbatim elsewhere in the corpus — the pass that catches licence
  *    headers, navigation chrome, and templated intros.
  *  - `emb_matryoshka_trunc`: Matryoshka-style truncation quality — how
  *    much of each embedding's norm survives keeping only the first 16
  *    of 64 dims (the cheap-ANN prefilter trade: truncated vectors cost
  *    4x less to scan; the retention ratio says what recall you're
  *    risking). Exact scaled-integer norms, so the ratio is portable.
  */
object QRound5i extends QueryPack {

  // ---- sub-document (paragraph) dedup ----

  /** Per-document duplicated-chunk profile: non-overlapping 16-token
    * chunks are md5-fingerprinted; a chunk is "duplicated" when the SAME
    * fingerprint appears in at least one OTHER document. Scale shape:
    * one explode + one groupBy on the fingerprint (uniform md5 key — no
    * skew), the per-fingerprint doc-count broadcastable only in
    * aggregate form, so it joins back shuffle-on-md5 (both sides already
    * clustered there); the per-doc rollup shuffles doc_id once. Short
    * final chunks (< 16 tokens) are kept — a shared short tail is still
    * a shared passage. */
  private def textDedupParagraph(s: SparkSession, d: String): DataFrame = {
    val win = 16
    val chunks = t(s, d, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        explode(sequence(lit(0),
          ceil(size(col("toks")).cast(DoubleType) / win).cast(IntegerType) - 1))
          .as("k"),
        col("toks"))
      .select(col("doc_id"), col("k"),
        md5(concat_ws(" ", slice(col("toks"), col("k") * win + 1, lit(win)))
          .cast(BinaryType)).as("fp"))
    val spread = chunks.groupBy("fp")
      .agg(countDistinct("doc_id").as("n_docs_with"))
    chunks.join(spread, "fp")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_docs_with") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup_chunks"),
        trunc4(col("n_dup_chunks") / col("n_chunks").cast(DoubleType))
          .as("dup_frac"))
      .orderBy("doc_id")
  }

  private val oTextDedupParagraph =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      | x AS (SELECT doc_id, unnest(range(0,
      |     CAST(ceil(len(w) / 16.0) AS INT))) AS k, w FROM t),
      | c AS (SELECT doc_id, k,
      |     md5(array_to_string(w[k*16+1 : least(k*16+16, len(w))], ' ')) AS fp
      |   FROM x),
      | s AS (SELECT fp, count(DISTINCT doc_id) AS n_docs_with FROM c GROUP BY fp)
      |SELECT c.doc_id, count(*) AS n_chunks,
      |  CAST(sum(CASE WHEN s.n_docs_with > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
      |  floor(sum(CASE WHEN s.n_docs_with > 1 THEN 1 ELSE 0 END)
      |    / CAST(count(*) AS DOUBLE) * 10000)/10000.0 AS dup_frac
      |FROM c JOIN s USING (fp) GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin

  // ---- Matryoshka truncation quality ----

  /** Norm-retention of the 16-dim prefix per embedding, profiled per
    * label: retention = ||v[1..16]|| / ||v||, computed from exact
    * scaled-long sums of squares (floor(x*1e6+0.5) per element BEFORE
    * squaring/summing — both engines then take sqrt of identical
    * integers, and IEEE sqrt is correctly rounded, so the doubles are
    * bit-identical). Scale shape: pure per-row lambda arithmetic — no
    * explode, no shuffle before the tiny per-label rollup. */
  private def embMatryoshkaTrunc(s: SparkSession, d: String): DataFrame = {
    val sq = "aggregate(%s, 0L, (acc, x) -> " +
      "acc + cast(floor(cast(x as double)*1000000 + 5e-1) as bigint) * " +
      "cast(floor(cast(x as double)*1000000 + 5e-1) as bigint))"
    t(s, d, "embeddings")
      .select(col("vec_id"), col("label"),
        expr(sq.format("slice(embedding, 1, 16)")).as("ss_head"),
        expr(sq.format("embedding")).as("ss_full"))
      // retention lands as a SCALED LONG (x1e4) immediately: averaging
      // raw doubles would be partition-order-dependent; integer sums are
      // exact at any partition count
      .select(col("vec_id"), col("label"),
        floor(sqrt(col("ss_head").cast(DoubleType)) /
          sqrt(col("ss_full").cast(DoubleType)) * 10000).cast(LongType)
          .as("ret_s"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        (min("ret_s") / 10000.0).as("min_ret"),
        trunc4(sum("ret_s") / count(lit(1)) / 10000.0).as("avg_ret"),
        (max("ret_s") / 10000.0).as("max_ret"))
      .orderBy("label")
  }

  private val oEmbMatryoshkaTrunc =
    """WITH s AS (SELECT vec_id, label,
      |    list_sum(list_transform(embedding[1:16],
      |      x -> CAST(floor(CAST(x AS DOUBLE)*1000000 + 5e-1) AS BIGINT)
      |         * CAST(floor(CAST(x AS DOUBLE)*1000000 + 5e-1) AS BIGINT))) AS ss_head,
      |    list_sum(list_transform(embedding,
      |      x -> CAST(floor(CAST(x AS DOUBLE)*1000000 + 5e-1) AS BIGINT)
      |         * CAST(floor(CAST(x AS DOUBLE)*1000000 + 5e-1) AS BIGINT))) AS ss_full
      |  FROM embeddings),
      | r AS (SELECT vec_id, label,
      |    CAST(floor(sqrt(CAST(ss_head AS DOUBLE)) / sqrt(CAST(ss_full AS DOUBLE))
      |      * 10000) AS BIGINT) AS ret_s
      |  FROM s)
      |SELECT label, count(*) AS n_vecs,
      |  min(ret_s) / 10000.0 AS min_ret,
      |  floor(CAST(sum(ret_s) AS DOUBLE) / count(*) / 10000.0 * 10000)/10000.0 AS avg_ret,
      |  max(ret_s) / 10000.0 AS max_ret
      |FROM r GROUP BY label ORDER BY label""".stripMargin

  val queries: Map[String, QFn] = Map(
    "text_dedup_paragraph" -> textDedupParagraph _,
    "emb_matryoshka_trunc" -> embMatryoshkaTrunc _)

  val oracles: Map[String, String] = Map(
    "text_dedup_paragraph" -> oTextDedupParagraph,
    "emb_matryoshka_trunc" -> oEmbMatryoshkaTrunc)
}
