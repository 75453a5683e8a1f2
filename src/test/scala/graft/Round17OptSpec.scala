package graft

import graft.sources.TxnLog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Optimization-round-17 gates.
  *
  * 1. Footer-derived per-file stats (TxnLog.statsLines fast path): the
  *    parquet-footer metadata fold must emit BYTE-IDENTICAL manifest
  *    stats tokens to the Spark aggregate pass it replaces — including
  *    negative values, NULL counts, an all-NULL column, multi-file
  *    appends, and every integral width — and the skipping reader must
  *    prune identically over both layouts.
  */
class Round17OptSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    Seq[(java.lang.Long, java.lang.Integer, java.lang.Short)](
      (-50L, null, null), (-7L, -3, null), (0L, 0, null),
      (3L, 9, null), (12L, null, null), (99L, 1000000, null),
      (100L, -2000000000, null), (8L, 7, null))
      .toDF("k", "v", "an")
      .withColumn("an", col("an").cast(ShortType))
  }

  private def stage(dir: String, footer: Boolean): Unit = {
    spark.conf.set("graft.txnlog.footerStats", footer.toString)
    try {
      TxnLog.appendWithStats(spark, dir, fixture.repartition(2), "k", "v", "an")
      TxnLog.appendWithStats(spark, dir,
        fixture.filter(col("k") > 50).repartition(1), "k", "v", "an")
    } finally spark.conf.set("graft.txnlog.footerStats", "true")
  }

  test("footer stats tokens byte-identical to the scan-pass tokens") {
    val base = graft.Staging.trackedTempDir("graft_r17stats_")
    val dA = s"$base/foot"; val dB = s"$base/scan"
    stage(dA, footer = true)
    stage(dB, footer = false)
    def toks(d: String): Seq[String] = {
      val v = TxnLog.latestVersion(spark, d).get
      // strip the uuid'd path; keep each line's ordered token suffix
      TxnLog.snapshotLines(spark, d, v)
        .map(ln => ln.substring(ln.indexOf('\t') + 1)).sorted
    }
    assert(toks(dA) == toks(dB))
    assert(toks(dA).exists(_.contains("stats:an=::")),
      "all-null column must emit empty min/max")
    assert(toks(dA).exists(_.contains("stats:k=-50:")),
      "negative minimum must survive the footer fold")
    // pruning decisions identical over both layouts; a provably
    // out-of-range probe prunes everything, null pruning keeps only the
    // null-bearing files
    val prunes = Seq(dA, dB).map { d =>
      val (_, k1, t1) = TxnLog.readSkipped(spark, d, "k", 60L, 200L)
      val (_, k2, t2) = TxnLog.readSkipped(spark, d, "k", 1000L, 2000L)
      val (_, k3, t3) = TxnLog.readSkippedNull(spark, d, "v")
      (k1, t1, k2, t2, k3, t3)
    }
    assert(prunes.head == prunes(1))
    assert(prunes.head._3 == 0, "out-of-range probe must open zero files")
    assert(prunes.head._2 == 3 && prunes.head._5 < prunes.head._6)
    val a = TxnLog.read(spark, dA).orderBy("k").collect().toSeq
    val b = TxnLog.read(spark, dB).orderBy("k").collect().toSeq
    assert(a == b)
  }

  /** 2. Size-gated state broadcasts (PageRank.stateHint): the iterative
    * graph loops must emit BIT-IDENTICAL results whether the per-round
    * V-row state is broadcast (small V, the default here) or the hint is
    * gated off (the 100 TB path, forced via broadcastStateMaxRows=0). */
  test("graph loops bit-identical with the state broadcast gated off") {
    def runAll(): Seq[Seq[String]] = {
      import spark.implicits._
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L),
        (5L, 1L), (6L, 2L), (7L, 3L)).toDF("src", "dst")
      Seq(
        operators.PageRank.ranks(edges).orderBy("id")
          .collect().map(_.toString).toSeq,
        operators.QRound9br.katzCentralityBuild(spark, sf)
          .collect().map(_.toString).toSeq,
        operators.QRound9bz.bootstrapPercolationBuild(spark, sf)
          .collect().map(_.toString).toSeq)
    }
    val withBc = runAll()
    spark.conf.set("graft.graph.broadcastStateMaxRows", "0")
    val noBc =
      try runAll()
      finally spark.conf.unset("graft.graph.broadcastStateMaxRows")
    assert(withBc == noBc)
  }

  /** 3. sorted_dot merge kernel (plans/VectorExprs.SortedDotLong): the
    * fused sparse-dot loop must equal the join-explode-aggregate
    * spelling it replaced in dedup_tfidf_nn — on the real posting table
    * AND on adversarial edges (disjoint keys, empty vectors, negative
    * weights, subset overlap). */
  test("sorted_dot == join-aggregate sparse dot, on real postings") {
    import spark.implicits._
    graft.plans.SortedDotLong.register(spark)
    // unit edges
    val cases = Seq(
      (Seq("a", "b", "c"), Seq(2L, 3L, 5L), Seq("b", "c", "d"),
        Seq(7L, -1L, 9L), 3L * 7L + 5L * -1L),
      (Seq.empty[String], Seq.empty[Long], Seq("x"), Seq(4L), 0L),
      (Seq("p"), Seq(-2L), Seq("q"), Seq(3L), 0L),
      (Seq("a", "z"), Seq(1L, 1L), Seq("a", "z"), Seq(1L, 1L), 2L))
    cases.zipWithIndex.foreach { case ((ka, va, kb, vb, want), i) =>
      val got = Seq((ka, va, kb, vb)).toDF("ka", "va", "kb", "vb")
        .selectExpr("sorted_dot(ka, va, kb, vb) AS d").head.getLong(0)
      assert(got == want, s"case $i: got $got, want $want")
    }
    // real postings: kernel dot over sorted doc vectors == the legacy
    // join + SUM(wa*wb) GROUP BY pair, for every blocked candidate pair
    val wp = operators.QRound9by.tfidfPostings(spark, sf)
    val cand = operators.QRound9by.tfidfNnCands(spark, sf)
    val dv = operators.QRound9by.tfidfDocVecs(spark, sf)
    val kernel = cand
      .join(dv.select(col("doc_id").as("da"), col("tks").as("tka"),
        col("ws").as("wsa")), "da")
      .join(dv.select(col("doc_id").as("db"), col("tks").as("tkb"),
        col("ws").as("wsb")), "db")
      .selectExpr("da", "db", "sorted_dot(tka, wsa, tkb, wsb) AS dot")
      .orderBy("da", "db").collect().map(_.toString).toSeq
    val legacy = cand
      .join(wp.select(col("doc_id").as("da"), col("tk"),
        col("w").as("wa")), "da")
      .join(wp.select(col("doc_id").as("db"), col("tk"),
        col("w").as("wb")), Seq("db", "tk"))
      .groupBy("da", "db").agg(sum(col("wa") * col("wb")).as("dot"))
      .orderBy("da", "db").collect().map(_.toString).toSeq
    assert(kernel.nonEmpty && kernel == legacy)
  }
}
