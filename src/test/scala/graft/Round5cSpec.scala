package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gates for the round-5 third wave (QRound5c): properties the DuckDB
  * hash-match can't see — bloom pruning actually prunes, the z-order
  * layout actually clusters, triangle math on a known fixture, mergeSchema
  * null placement, and repetition stats against a hand-computed doc. */
class Round5cSpec extends SparkSpec {
  import spark.implicits._

  test("join_bloom_prune: matches the plain join and the bloom prunes rows") {
    val out = SparkEntry.queries("join_bloom_prune")(spark, sf)
    val dim = sources.Tables.t(spark, sf, "supplier")
      .filter(col("s_acctbal") > 4500).select("s_suppkey", "s_nationkey")
    val plain = sources.Tables.t(spark, sf, "lineitem")
      .join(dim, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_items"),
        sources.Tables.sum4(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
      .orderBy("s_nationkey")
    assert(out.collect().toSeq === plain.collect().toSeq,
      "bloom-pruned join result differs from the exact plain join")
    // the sketch itself must prune: probe-filtered fact < full fact
    val li = sources.Tables.t(spark, sf, "lineitem")
    val nKeys = dim.count()
    val bf = dim.stat.bloomFilter("s_suppkey", math.max(nKeys, 1), 0.01)
    val probe = udf((k: Long) => bf.mightContain(k))
    val kept = li.filter(probe(col("l_suppkey"))).count()
    val total = li.count()
    assert(kept < total, s"bloom kept all $total rows — no pruning happened")
    // and it must keep every true match (no false negatives, ever)
    val trueMatches = li.join(dim, col("l_suppkey") === col("s_suppkey")).count()
    assert(kept >= trueMatches, "bloom dropped true-matching rows")
  }

  test("graph_triangle_count: exact counts on a known fixture graph") {
    // 4-clique {0,1,2,3} plus pendant edge 3-4:
    // 7 edges, wedges = sum C(deg,2) = C(3,2)*3 + C(4,2) + C(1,2) = 9+6+0 = 15,
    // triangles = C(4,3) = 4
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L), (3L, 4L))
    // encode each edge as one synthetic "order" containing both parts
    val li = edges.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((i.toLong, a), (i.toLong, b))
    }.toDF("l_orderkey", "l_partkey")
    val e = operators.QRound5c.coEdges(li)
    assert(e.count() === 7)
    val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val wedges = deg.agg(sum(col("deg") * (col("deg") - 1) / 2).cast(LongType))
      .as[Long].head()
    assert(wedges === 15L)
    val tri = e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("wa"), col("e2.b").as("wc"))
      .join(e.as("e3"), col("wa") === col("e3.a") && col("wc") === col("e3.b"))
      .count()
    assert(tri === 4L)
  }

  test("triCounts: exact per-edge triangle participation on the fixture graph") {
    // same 4-clique {0,1,2,3} + pendant 3-4 as above, but through the REAL
    // shared enumeration (r11: triCounts feeds both graph_triangle_count
    // and graph_local_bridges): every K4 edge lies in exactly 2 triangles,
    // the pendant edge in none — so the table has 6 rows of tc=2, Σtc = 12
    // = 3 × 4 triangles, and the bridge anti-join leaves exactly (3,4).
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L), (3L, 4L))
    val li = edges.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((i.toLong, a), (i.toLong, b))
    }.toDF("l_orderkey", "l_partkey")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_trifix_").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val tc = operators.QRound5c.triCounts(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(tc.size === 6, s"expected the 6 clique edges, got ${tc.keySet}")
    assert(tc.values.forall(_ === 2L), s"per-edge counts off: $tc")
    assert(!tc.contains((3L, 4L)), "pendant edge must not appear")
    val t = SparkEntry.queries("graph_triangle_count")(spark, dir).collect()(0)
    assert((t.getAs[Long]("n_edges"), t.getAs[Long]("n_wedges"),
      t.getAs[Long]("n_triangles")) === ((7L, 15L, 4L)))
    assert(t.getAs[Double]("global_cc") === 0.8)
    val b = SparkEntry.queries("graph_local_bridges")(spark, dir).collect()(0)
    assert((b.getAs[Long]("n_edges"), b.getAs[Long]("n_tri_edges"),
      b.getAs[Long]("n_local_bridges")) === ((7L, 6L, 1L)))
  }

  test("graph_triangle_count: sf output is internally consistent") {
    val r = SparkEntry.queries("graph_triangle_count")(spark, sf).collect()(0)
    val (ne, nw, nt) = (r.getAs[Long]("n_edges"), r.getAs[Long]("n_wedges"),
      r.getAs[Long]("n_triangles"))
    assert(ne > 0 && nw > 0, "degenerate graph")
    // every triangle contains 3 wedges; cc in [0,1]
    assert(3 * nt <= nw, "more closed wedges than wedges")
    val cc = r.getAs[Double]("global_cc")
    assert(cc >= 0.0 && cc <= 1.0)
  }

  test("text_repetition_stats: hand-computed doc agrees") {
    val doc = sources.Tables.t(spark, sf, "documents")
      .filter(col("doc_id") === 0).select("text").as[String].head()
    val toks = doc.split(" ").toSeq
    val byCnt = toks.groupBy(identity).view.mapValues(_.size).toMap
    val expTop = byCnt.toSeq.sortBy { case (t, c) => (-c, t) }.head
    val row = SparkEntry.queries("text_repetition_stats")(spark, sf)
      .filter(col("doc_id") === 0).collect()(0)
    assert(row.getAs[Long]("n_tokens") === toks.size.toLong)
    assert(row.getAs[Long]("n_distinct") === byCnt.size.toLong)
    assert(row.getAs[String]("top_tok") === expTop._1)
    val expTopFrac = math.floor(expTop._2.toDouble / toks.size * 10000) / 10000.0
    assert(row.getAs[Double]("top_frac") === expTopFrac)
  }

  test("text_url_extract: every doc contributes 1 or 2 URLs") {
    val out = SparkEntry.queries("text_url_extract")(spark, sf)
    val nDocs = sources.Tables.t(spark, sf, "documents").count()
    val totalUrls = out.agg(sum("n_urls")).as[Long].head()
    // one site URL per doc + one CDN URL per doc_id%3==0 doc
    val expExtra = sources.Tables.t(spark, sf, "documents")
      .filter(col("doc_id") % 3 === 0).count()
    assert(totalUrls === nDocs + expExtra,
      s"expected ${nDocs + expExtra} URLs, extracted $totalUrls")
    // domains partition into the two synthetic families
    val doms = out.select("domain").as[String].collect()
    assert(doms.forall(d => d.endsWith(".example.com") || d.endsWith(".example.net")))
  }

  test("maint_zorder_cluster: z-layout shrinks per-partition bounding boxes") {
    val li = sources.Tables.t(spark, sf, "lineitem")
      .withColumn("zval", operators.QRound5c.zval(col("l_partkey"), col("l_suppkey")))
    def avgBboxArea(df: org.apache.spark.sql.DataFrame): Double = {
      val parts = df
        .withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("l_partkey") - min("l_partkey")).as("dx"),
          (max("l_suppkey") - min("l_suppkey")).as("dy"))
        .select((col("dx").cast(DoubleType) + 1) * (col("dy").cast(DoubleType) + 1))
        .as[Double].collect()
      parts.sum / parts.length
    }
    val natural = avgBboxArea(li.repartition(8, col("l_orderkey")))
    val zOrdered = avgBboxArea(
      li.repartitionByRange(8, col("zval")).sortWithinPartitions("zval"))
    assert(zOrdered < natural / 2,
      s"z-order bbox $zOrdered not even 2x tighter than natural $natural")
  }

  test("maint_zorder_cluster: zval matches a reference Morton implementation") {
    def mortonRef(x: Long, y: Long): Long =
      (0 until 21).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.sum
    val sample = sources.Tables.t(spark, sf, "lineitem")
      .select("l_partkey", "l_suppkey").limit(200)
      .withColumn("z", operators.QRound5c.zval(col("l_partkey"), col("l_suppkey")))
      .collect()
    sample.foreach { r =>
      assert(r.getAs[Long]("z") ===
        mortonRef(r.getAs[Long]("l_partkey"), r.getAs[Long]("l_suppkey")))
    }
  }

  test("scan_schema_merge: missing column surfaces as NULL, nothing dropped") {
    val out = SparkEntry.queries("scan_schema_merge")(spark, sf).collect()
    val orders = sources.Tables.t(spark, sf, "orders")
    val total = orders.count()
    assert(out.map(_.getAs[Long]("n")).sum === total,
      "mergeSchema read dropped rows")
    val missing = out.filter(_.getAs[String]("status") == "<missing>")
    assert(missing.length === 1, "old-file rows did not surface as <missing>")
    val expMissing = orders.filter(col("o_orderkey") % 2 === 0).count()
    assert(missing.head.getAs[Long]("n") === expMissing)
  }
}
