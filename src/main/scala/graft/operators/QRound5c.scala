package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-5 third wave (SURVEY §2.16) — six surfaces nothing else covers:
  *
  *  - `join_bloom_prune`: explicit bloom-filter semi-join reduction — the
  *    100 TB join pattern where a tiny filtered dimension broadcasts a
  *    sketch, not rows, and the fact scan drops non-joining rows BEFORE
  *    the shuffle. Spark's own InjectRuntimeFilter does this implicitly;
  *    here the pattern is a first-class operator with an exactness proof
  *    (the exact join behind the bloom removes every false positive, so
  *    the output hash-matches a plain-join oracle).
  *  - `graph_triangle_count`: distributed triangle counting over the
  *    parts-bought-together co-occurrence graph — edge/wedge/triangle
  *    tallies + global clustering coefficient, the classic "can your
  *    engine do graphs without a graph engine" benchmark (same shape as
  *    the near-dup similarity graph at corpus scale).
  *  - `text_repetition_stats`: Gopher-style repetition quality signals
  *    per document (duplicate-token fraction, top-token fraction) — the
  *    standard "is this document degenerate boilerplate" filter in LLM
  *    training-data pipelines.
  *  - `text_url_extract`: URL → domain extraction + per-domain corpus
  *    stats — the provenance/blocklist pass every web-scale corpus runs.
  *    The synthetic corpus carries no URLs, so both engines inject the
  *    same deterministic synthetic URLs first (the QRound5b PII-redact
  *    pattern); the regex extraction and domain rollup are the real
  *    operator under test.
  *  - `maint_zorder_cluster`: Z-order (Morton-interleave) data layout —
  *    THE lake-maintenance trick for two-dimensional pruning. The query
  *    computes bit-exact z-values in both engines and aggregates per
  *    z-bucket; the Spark side additionally materializes a
  *    range-partitioned-by-z copy and reads the aggregate through it,
  *    so the hash-match doubles as a lossless-layout proof. Round5cSpec
  *    gates the actual clustering win (per-partition bounding boxes).
  *  - `scan_schema_merge`: parquet schema evolution — old files lack a
  *    column newer files carry; `mergeSchema` reads must surface the
  *    missing column as NULL, not fail or silently drop it. Every lake
  *    that ever added a column needs this read path.
  */
object QRound5c extends QueryPack {

  // ---- bloom-filter semi-join reduction ----

  /** Revenue by nation over lineitem rows whose supplier clears a balance
    * bar. The filtered supplier set is small (~45% of 1k suppliers at
    * sf0.1) while lineitem is the 100 TB side, so the scale play is: build
    * a bloom filter over the dim keys (a few KB — vs broadcasting rows,
    * this survives dims of hundreds of millions of keys), ship it to every
    * fact partition, and drop non-joining rows at the scan, BEFORE the
    * join shuffle. The trailing exact join removes bloom false positives,
    * which is why the output is deterministic and hash-matches a
    * plain-join oracle even though the bloom itself is probabilistic.
    * The membership probe is a scala UDF (Spark's codegen'd
    * `might_contain` expression is internal-only); it breaks codegen for
    * the one boolean probe but the row-reduction it buys at scale
    * dominates. fpp=0.01 ⇒ ~1% of non-matching rows survive to the join. */
  private def joinBloomPrune(s: SparkSession, d: String): DataFrame = {
    val dim = t(s, d, "supplier").filter(col("s_acctbal") > 4500)
      .select("s_suppkey", "s_nationkey")
    val nKeys = math.max(dim.count(), 1L) // tiny: count of filtered dim keys
    val bf = dim.stat.bloomFilter("s_suppkey", nKeys, 0.01)
    val probe = udf((k: Long) => bf.mightContain(k))
    t(s, d, "lineitem")
      .filter(probe(col("l_suppkey"))) // sketch-prune before the shuffle
      .join(dim, col("l_suppkey") === col("s_suppkey")) // exact: kills FPs
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_items"),
        sum4(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
      .orderBy("s_nationkey")
  }

  private val oJoinBloomPrune =
    """SELECT s_nationkey, count(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |WHERE s_acctbal > 4500
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  // ---- distributed triangle counting ----

  /** Co-occurrence edges: two parts are linked when some order contains
    * both (undirected, deduped, stored once as a<b). Exposed for the
    * Round5cSpec fixture test. */
  private[graft] def coEdges(li: DataFrame): DataFrame = {
    // keyed by ok ALONE (r17, guide §2.4 "share one exchange"):
    // HashPartitioning(ok) satisfies BOTH the (ok, pk) distinct's
    // clustering and the self-join's ok clustering, so the dedup and the
    // join run off one exchange instead of three (the (ok, pk)-keyed
    // distinct exchange could not be reused by the ok-keyed join).
    // Per-order item counts are small and uniform, so the coarser key
    // adds no skew; DISTINCT output is set-equal either way.
    val op = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .repartition(col("ok"))
      .distinct()
    op.as("x").join(op.as("y"), col("x.ok") === col("y.ok"))
      .filter(col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("a"), col("y.pk").as("b"))
      .distinct()
  }

  /** Memoized + lineage-truncated per-edge triangle-participation table
    * (a, b, tc): ONE triangle enumeration shared by `graph_triangle_count`
    * (n_triangles = Σtc div 3 — each triangle credits its 3 edges) and
    * `graph_local_bridges` (bridges = edges absent from it). VERDICT r10
    * #3: the two keys each ran the full wedge-join ⋈ closing-probe
    * enumeration, so the suite paid the ~49M-row expansion twice; the
    * shared memo pays it once and both warm runs read an O(E)-bounded
    * cached table (only edges in ≥1 triangle appear — the 3-per-triangle
    * explosion is hash-aggregated with map-side partial combine, never
    * materialized). The memo TAG embeds the broadcast-ceiling conf, so
    * PlanSpec's degrade-parity gates genuinely re-execute the shuffle-join
    * dataflow under `broadcastMaxEdges=0` instead of reading the
    * broadcast-path cache. */
  private[graft] def triCounts(s: SparkSession, d: String): DataFrame = {
    val maxBcEdges =
      s.conf.get("graft.triangle.broadcastMaxEdges", "8000000").toLong
    graft.Memo.memo(s, s"tricounts@$maxBcEdges", d)(
      triCountsBuild(s, d).localCheckpoint(true))
  }

  /** The raw (un-memoized) enumeration dataflow behind [[triCounts]] —
    * exposed so PlanSpec asserts the join shapes on the plan that actually
    * builds the memo (post-memo plans show only the checkpoint scan).
    *
    * Scale shape: the classic two-join enumeration — triangles by joining
    * edge(a,b) ⋈ edge(b,c) on the shared middle then probing the packed
    * closing-edge key a·2³¹+c; every edge is stored once in canonical a<b
    * order, so each triangle is enumerated exactly once (a<m<c). The edge
    * list (~1.2M rows / 14 MB at sf0.1 — vertices × avg-degree/2, NOT the
    * raw table size) is far smaller than the ~49M-row wedge stream it
    * generates, so while it fits the broadcast budget both enumeration
    * joins broadcast it and the wedge stream stays map-side, never
    * shuffling; the only exchanges are the edge build, the explicit
    * repartition that spreads the expansion across cores (see inline
    * comment — AQE would coalesce it away), and the final per-edge tally
    * (≤3T rows in, ≤E groups out, map-side combined). The broadcast is
    * SIZE-CONDITIONAL: past `graft.triangle.broadcastMaxEdges` (default
    * 8M edges ≈ 256 MB serialized — comfortably under Spark's 8 GB
    * broadcast hard cap and big-executor memory, but a real ceiling: an
    * O(E) broadcast cannot grow with a 100× corpus) the identical
    * dataflow degrades to sort-merge joins on uniform keys instead of
    * dying at the driver. The closing probe joins on ONE packed long
    * because a single-long key gets the dense LongHashedRelation
    * (measured 6x faster than the two-column relation) and halves the
    * fallback shuffle's key width; 31 bits per endpoint (keys < 2⁶²),
    * vertex ids guarded < 2³¹ at runtime. At billions of edges, also
    * orient edges by degree instead of id to bound the per-middle wedge
    * fan-out. */
  private[graft] def triCountsBuild(s: SparkSession, d: String): DataFrame = {
    val e = coEdgesMemo(s, d)
    // pin the probe side's parallelism: the edge list is only ~14 MB, so
    // AQE coalesces its shuffle output to ~1 partition — and the 49M-row
    // wedge expansion downstream of it would run single-threaded. An
    // explicit repartition (which AQE never coalesces) spreads the
    // EXPANSION, whose volume is invisible to AQE's input-size heuristic.
    val parts = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // The packing is injective ONLY below 2^31 — beyond it, distinct
    // wedges would alias to one key and the count silently inflates, so
    // fail loudly instead. One tiny job over the cached edge list yields
    // both the guard bound and the edge count that decides broadcast.
    val stats = e.agg(max("b").as("max_v"), count(lit(1)).as("cnt")).collect()(0)
    val maxV = stats.getLong(0)
    val edgeCnt = stats.getLong(1)
    require(maxV < (1L << 31),
      s"vertex id $maxV >= 2^31 — packed triangle probe key would alias; " +
        "widen the packing before running at this scale")
    val pack = lit(1L << 31)
    val e3k = e.select((col("a") * pack + col("b")).as("ab"))
    val maxBcEdges =
      s.conf.get("graft.triangle.broadcastMaxEdges", "8000000").toLong
    val tri = if (edgeCnt <= maxBcEdges) {
      // broadcast path: wedge stream never shuffles
      e.repartition(parts, col("a")).as("e1")
        .join(broadcast(e.as("e2")), col("e1.b") === col("e2.a"))
        .select(col("e1.a").as("a"), col("e1.b").as("m"), col("e2.b").as("c"),
          (col("e1.a") * pack + col("e2.b")).as("ab"))
        .join(broadcast(e3k), "ab")
    } else {
      // degrade path: same dataflow, sort-merge joins on uniform keys
      // (middle vertex, then the packed closing edge) — O(E + wedges)
      // shuffle volume instead of an O(E) driver/executor broadcast
      e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
        .select(col("e1.a").as("a"), col("e1.b").as("m"), col("e2.b").as("c"),
          (col("e1.a") * pack + col("e2.b")).as("ab"))
        .join(e3k, "ab")
    }
    // each triangle a<m<c credits its 3 canonical edges; hash-agg with
    // map-side partial combine, so output is ≤E rows regardless of T
    tri.select(explode(array(
        struct(col("a"), col("m").as("b")),
        struct(col("m").as("a"), col("c").as("b")),
        struct(col("a"), col("c").as("b")))).as("ed"))
      .groupBy(col("ed.a").as("a"), col("ed.b").as("b"))
      .agg(count(lit(1)).as("tc"))
  }

  /** Memoized persisted co-occurrence edge list: persisting anew on every
    * call would leak one cache entry per call for the session lifetime
    * (the ADVICE r3 defect QSim.embPersisted was rewritten to fix). */
  private[graft] def coEdgesMemo(s: SparkSession, d: String): DataFrame =
    graft.Memo.memo(s, "coedges", d)(
      coEdges(t(s, d, "lineitem"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Memoized persisted BIDIRECTIONAL co-occurrence edges (u, v) — the
    * `coedges ∪ swap` union that katz and percolation each re-derived
    * per power-iteration round (OPTIMIZATION r16): un-memoized, every
    * round re-scanned the persisted half-edge cache and re-ran the
    * union map (~2E rows x rounds x keys); persisted once, each round's
    * join reads the cached 2E-row table directly. */
  private[graft] def coDirMemo(s: SparkSession, d: String): DataFrame =
    graft.Memo.memo(s, "codir", d) {
      val e = coEdgesMemo(s, d)
      e.select(col("a").as("u"), col("b").as("v"))
        .union(e.select(col("b").as("u"), col("a").as("v")))
        // pre-partitioned by v ONCE (r17, guide §2.4 "establish the
        // partitioning once"): every consumer joins on u via a broadcast
        // (stream side keeps this partitioning) and then aggregates or
        // distincts BY v — katz's degree pass + 4 rounds, percolation's
        // seed distinct + 4 rounds — so each of those ~10 per-round
        // exchanges is elided for the price of one build-time shuffle.
        // Long-sum/count aggregates are order-free: values unchanged.
        .repartition(col("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** Edge/wedge/triangle tally + global clustering coefficient over the
    * co-occurrence graph. Wedges via a single groupBy on vertex degree
    * (no join); triangles from the SHARED memoized per-edge participation
    * table [[triCounts]] (each triangle credits 3 edges, so
    * n_triangles = Σtc div 3 — exact, the sum is divisible by 3 by
    * construction); enumeration shape + scale posture documented there. */
  private def graphTriangleCount(s: SparkSession, d: String): DataFrame = {
    val e = coEdgesMemo(s, d)
    val nEdges = e.select(count(lit(1)).as("n_edges"))
    val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val nWedges = deg.select(
      sum(col("deg") * (col("deg") - 1) / 2).cast(LongType).as("n_wedges"))
    val tri = triCounts(s, d)
      .agg(coalesce(sum(col("tc")), lit(0L)).as("tc3"))
      .select(expr("tc3 div 3").as("n_triangles"))
    val out = nEdges.crossJoin(nWedges).crossJoin(tri)
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
        trunc4(col("n_triangles") * 3.0 / col("n_wedges")).as("global_cc"))
    out
  }

  private val oGraphTriangleCount =
    """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      | e AS (SELECT DISTINCT x.pk AS a, y.pk AS b
      |       FROM op x JOIN op y ON x.ok = y.ok WHERE x.pk < y.pk),
      | deg AS (SELECT v, count(*) AS deg FROM
      |   (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) GROUP BY v),
      | w AS (SELECT CAST(sum(deg * (deg - 1) / 2) AS BIGINT) AS n_wedges FROM deg),
      | tr AS (SELECT count(*) AS n_triangles
      |   FROM e e1 JOIN e e2 ON e1.b = e2.a
      |   JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      | ne AS (SELECT count(*) AS n_edges FROM e)
      |SELECT ne.n_edges, w.n_wedges, tr.n_triangles,
      |  floor(tr.n_triangles * 3.0 / w.n_wedges * 10000)/10000.0 AS global_cc
      |FROM ne, w, tr""".stripMargin

  // ---- Gopher-style repetition quality signals ----

  /** Per-document duplicate-token fraction and top-token fraction — the
    * two repetition signals (Gopher §A.1.1 analogues) that catch
    * degenerate/boilerplate documents in training-data curation. The top
    * token tie-breaks deterministically (highest count, then
    * lexicographically smallest token). Scale shape: explode + ONE
    * shuffle on (doc_id, token) to token counts, then a window
    * partitioned by doc_id (never global); output is one row per doc. */
  private def textRepetitionStats(s: SparkSession, d: String): DataFrame = {
    val toks = t(s, d, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("cnt").desc, col("tok").asc)
    toks
      .withColumn("rn", row_number().over(w))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(when(col("rn") === 1, col("tok"))).as("top_tok"),
        max(when(col("rn") === 1, col("cnt"))).as("top_cnt"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        trunc4(lit(1) - col("n_distinct") / col("n_tokens").cast(DoubleType))
          .as("dup_frac"),
        col("top_tok"),
        trunc4(col("top_cnt") / col("n_tokens").cast(DoubleType))
          .as("top_frac"))
      .orderBy("doc_id")
  }

  private val oTextRepetitionStats =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      | c AS (SELECT doc_id, tok, count(*) AS cnt FROM toks GROUP BY 1, 2),
      | r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
      |         ORDER BY cnt DESC, tok ASC) AS rn FROM c)
      |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens, count(*) AS n_distinct,
      |  floor((1 - count(*) / CAST(sum(cnt) AS DOUBLE)) * 10000)/10000.0 AS dup_frac,
      |  max(CASE WHEN rn = 1 THEN tok END) AS top_tok,
      |  floor(max(CASE WHEN rn = 1 THEN cnt END) / CAST(sum(cnt) AS DOUBLE) * 10000)/10000.0 AS top_frac
      |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- URL/domain extraction ----

  private val urlRe = "https?://([A-Za-z0-9.-]+)"

  /** Domain rollup over extracted URLs. The corpus has no URLs (verified:
    * zero "http" occurrences), so both engines append the SAME
    * deterministic synthetic URLs — every doc one site-N link, every
    * third doc a second CDN link — and the regex domain extraction +
    * per-domain rollup is the operator under test. Scale shape: pure
    * per-row regexp (codegen'd) + explode, one shuffle on domain;
    * domain cardinality is tiny next to doc count, and the final
    * distinct-doc count per domain is a partial-aggregated
    * count(distinct) on that already-shuffled key. */
  private def textUrlExtract(s: SparkSession, d: String): DataFrame = {
    t(s, d, "documents")
      .withColumn("full_text", concat(
        col("text"), lit(" see https://site"), col("doc_id") % 7,
        lit(".example.com/p/"), col("doc_id"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" and http://cdn"), col("doc_id") % 5,
            lit(".example.net/x")))
          .otherwise(lit(""))))
      .select(col("doc_id"),
        explode(expr(s"regexp_extract_all(full_text, '$urlRe', 1)"))
          .as("domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct("doc_id").as("n_docs"))
      .orderBy("domain")
  }

  private val oTextUrlExtract =
    """WITH d AS (SELECT doc_id,
      |    concat(text, ' see https://site', doc_id % 7, '.example.com/p/', doc_id,
      |      CASE WHEN doc_id % 3 = 0
      |           THEN concat(' and http://cdn', doc_id % 5, '.example.net/x')
      |           ELSE '' END) AS full_text
      |  FROM documents),
      | u AS (SELECT doc_id,
      |    unnest(regexp_extract_all(full_text, 'https?://([A-Za-z0-9.-]+)', 1)) AS domain
      |  FROM d)
      |SELECT domain, count(*) AS n_urls, count(DISTINCT doc_id) AS n_docs
      |FROM u GROUP BY domain ORDER BY domain""".stripMargin

  // ---- Z-order layout maintenance ----

  /** Morton interleave of two 21-bit dimensions (keys up to 2M — an
    * order of magnitude past any test sf; wider keys would silently
    * alias k and k+2^21 to one z-value and quietly stop clustering on
    * that dimension), bit i of x → bit 2i, bit i of y → bit 2i+1. Pure
    * integer arithmetic (shift/mask/sum of disjoint bits), so Spark and
    * DuckDB compute it bit-identically. */
  private val zBits = 21

  private[graft] def zval(x: Column, y: Column): Column =
    (0 until zBits).map { i =>
      (shiftright(x, i) % 2) * lit(1L << (2 * i)) +
        (shiftright(y, i) % 2) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  private[operators] def zvalSql(x: String, y: String): String =
    (0 until zBits).map { i =>
      s"((($x >> $i) & 1) * ${1L << (2 * i)} + (($y >> $i) & 1) * ${1L << (2 * i + 1)})"
    }.mkString(" + ")

  /** Z-order clustering of lineitem on (l_partkey, l_suppkey): compute the
    * Morton code, range-partition + sort the table by it, materialize the
    * clustered copy, and aggregate per z-bucket THROUGH that copy. The
    * oracle computes the same per-bucket aggregate straight off the
    * original table, so a hash-match proves both the bit-exact z-math and
    * that the relayout was lossless. Why it matters at 100 TB: sorting by
    * the interleaved code gives every file a tight bounding box in BOTH
    * dimensions, so min/max file stats prune point/range queries on either
    * key — one layout serving two access paths (Round5cSpec measures the
    * bbox shrink vs the natural layout). Scale shape: repartitionByRange
    * samples the z-distribution, so files stay balanced even when the key
    * space is sparse; the z-bucket agg shuffles once on a ~256-value key. */
  private def maintZorderCluster(s: SparkSession, d: String): DataFrame = {
    val dir = QRound3.staged(s, d, "zorder") { dir =>
      t(s, d, "lineitem")
        .withColumn("zval", zval(col("l_partkey"), col("l_suppkey")))
        .repartitionByRange(8, col("zval"))
        .sortWithinPartitions("zval")
        .write.mode("overwrite").parquet(s"$dir/clustered")
    }
    s.read.parquet(s"$dir/clustered")
      .groupBy((col("zval") / lit(1L << 16)).cast(LongType).as("zbucket"))
      .agg(count(lit(1)).as("n"),
        min("l_partkey").as("min_part"), max("l_partkey").as("max_part"),
        min("l_suppkey").as("min_supp"), max("l_suppkey").as("max_supp"),
        sum4(col("l_extendedprice")).as("sum_price"))
      .orderBy("zbucket")
  }

  private val oMaintZorderCluster = {
    val z = zvalSql("l_partkey", "l_suppkey")
    s"""WITH z AS (SELECT *, $z AS zval FROM lineitem)
       |SELECT CAST(floor(zval / ${1L << 16}) AS BIGINT) AS zbucket,
       |  count(*) AS n,
       |  min(l_partkey) AS min_part, max(l_partkey) AS max_part,
       |  min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
       |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin
  }

  // ---- parquet schema evolution (mergeSchema) ----

  /** Schema-evolution read: half the orders land in "old" files without
    * o_orderstatus, half in "new" files that carry it; a mergeSchema read
    * must union the footers and surface the missing column as NULL. The
    * aggregate buckets old rows under '<missing>', so the oracle (which
    * simulates the split with a CASE on the same predicate) hash-verifies
    * that no row was dropped and no status leaked into old files. Scale
    * note: mergeSchema reconciles footers with a distributed job — cheap
    * next to the scan — and in production the merged schema would be
    * pinned in a catalog so the read path pays it once, not per query. */
  private def scanSchemaMerge(s: SparkSession, d: String): DataFrame = {
    val dir = QRound3.staged(s, d, "schemamerge") { dir =>
      val o = t(s, d, "orders")
      o.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite").parquet(s"$dir/evolved/old")
      o.filter(col("o_orderkey") % 2 === 1)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .write.mode("overwrite").parquet(s"$dir/evolved/new")
    }
    s.read.option("mergeSchema", "true")
      .parquet(s"$dir/evolved/old", s"$dir/evolved/new")
      .groupBy(coalesce(col("o_orderstatus"), lit("<missing>")).as("status"))
      .agg(count(lit(1)).as("n"), sum4(col("o_totalprice")).as("sum_price"),
        min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
      .orderBy("status")
  }

  private val oScanSchemaMerge =
    """SELECT CASE WHEN o_orderkey % 2 = 0 THEN '<missing>' ELSE o_orderstatus END AS status,
      |  count(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, QFn] = Map(
    "join_bloom_prune"      -> joinBloomPrune _,
    "graph_triangle_count"  -> graphTriangleCount _,
    "text_repetition_stats" -> textRepetitionStats _,
    "text_url_extract"      -> textUrlExtract _,
    "maint_zorder_cluster"  -> maintZorderCluster _,
    "scan_schema_merge"     -> scanSchemaMerge _)

  val oracles: Map[String, String] = Map(
    "join_bloom_prune"      -> oJoinBloomPrune,
    "graph_triangle_count"  -> oGraphTriangleCount,
    "text_repetition_stats" -> oTextRepetitionStats,
    "text_url_extract"      -> oTextUrlExtract,
    "maint_zorder_cluster"  -> oMaintZorderCluster,
    "scan_schema_merge"     -> oScanSchemaMerge)
}
