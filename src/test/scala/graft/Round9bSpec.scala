package graft

import org.apache.spark.sql.functions._

/** Round-9 extension gates (SURVEY §2.27): hand-computed fixtures for the
  * KM estimator, CUSUM invariants, planted autocorrelation / MAD / C4 /
  * BFS geometry, decode-vs-formula channel sums, and determinism probes.
  */
class Round9bSpec extends SparkSpec {

  private def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")

  test("chp_survival_km: hand-computed KM table on a planted gap fixture") {
    import spark.implicits._
    // u1: events at 0h,1h,2h (gaps 1,1; censored 1)  u2: 0h,3h (gap 3;
    // censored 0)  u3: 0h (censored 3).  wend = 3h.
    // t=0: d=0 c=1 n=6 h=0 S=1 | t=1: d=2 c=1 n=5 h=.4 S=.6
    // t=3: d=1 c=1 n=2 h=.5 S=.3
    val ev = Seq((1L, 1L, ts(0)), (1L, 2L, ts(1)), (1L, 3L, ts(2)),
      (2L, 4L, ts(0)), (2L, 5L, ts(3)), (3L, 6L, ts(0)))
      .toDF("user_id", "event_id", "ts")
    val out = operators.QRound9b.survivalKm(ev).collect()
    val got = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got === Seq(
      (0L, 6L, 0L, 1L, 0.0, 1.0),
      (1L, 5L, 2L, 1L, 0.4, 0.6),
      (3L, 2L, 1L, 1L, 0.5, 0.3)), s"KM table mismatch: $got")
  }

  test("chp_survival_km: driver-data invariants + partition determinism") {
    val out = SparkEntry.queries("chp_survival_km")(spark, sf).collect()
    assert(out.nonEmpty)
    // survival is nonincreasing in t; n_risk strictly decreasing; the
    // at-risk count at the smallest t equals all gaps ever observed
    val surv = out.map(_.getAs[Double]("survival"))
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a + 1e-12 },
      "survival not monotone nonincreasing")
    val risk = out.map(_.getAs[Long]("n_risk"))
    assert(risk.zip(risk.tail).forall { case (a, b) => b < a },
      "n_risk not strictly decreasing")
    val totalGaps = out.map(r =>
      r.getAs[Long]("n_event") + r.getAs[Long]("n_censored")).sum
    assert(risk.head === totalGaps, "n_risk(min t) != total gaps")
    // same table from a 1-partition replay of the same events
    val one = operators.QRound9b.survivalKm(
      graft.sources.Tables.t(spark, sf, "events").repartition(1)).collect()
    assert(one.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq,
      "KM table depends on partitioning")
  }

  test("ts_changepoint_cusum: series-end zero + flag re-derivation") {
    val out = SparkEntry.queries("ts_changepoint_cusum")(spark, sf).collect()
    assert(out.nonEmpty)
    val byType = out.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (et, rows) =>
      // C_n = n·total − n·total = 0 at the end of every series
      assert(rows.last.getAs[Long]("cusum_scaled") === 0L,
        s"$et: CUSUM does not return to 0 at series end")
      val n = rows.length.toLong
      val total = rows.map(_.getAs[Long]("cnt")).sum
      rows.foreach { r =>
        val flag = math.abs(r.getAs[Long]("cusum_scaled")) * 10 > n * total
        assert(r.getAs[Boolean]("flag") === flag, s"$et: flag mismatch")
      }
    }
  }

  test("ts_autocorr_lag: alternating planted series has autocorr -1") {
    import spark.implicits._
    val daily = (0 until 20).map(i =>
      ("a", i.toLong, if (i % 2 == 0) 1L else 5L))
      .toDF("event_type", "day_num", "cnt")
    val out = operators.QRound9b.autocorrLag(daily).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_pairs") === 19L)
    assert(out.head.getAs[Double]("autocorr_lag1") === -1.0,
      s"expected -1.0, got ${out.head.getAs[Double]("autocorr_lag1")}")
    // driver data: all values in [-1, 1]
    val drv = SparkEntry.queries("ts_autocorr_lag")(spark, sf).collect()
    assert(drv.forall(r => math.abs(r.getAs[Double]("autocorr_lag1")) <= 1.0))
  }

  test("win_mad_outlier: planted group med/MAD/fence geometry") {
    import spark.implicits._
    val o = Seq(1.0, 2.0, 3.0, 4.0, 100.0).map(v => ("G", v))
      .toDF("o_orderpriority", "o_totalprice")
    val out = operators.QRound9b.madOutlier(o).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Double]("med") === 3.0)
    assert(r.getAs[Double]("mad") === 1.0) // devs {2,1,0,1,97} -> median 1
    assert(r.getAs[Long]("n_outliers") === 1L) // only 97 > 3
    assert(r.getAs[Long]("n") === 5L)
  }

  test("sample_reservoir_weighted: size, determinism, weight bias") {
    val q = SparkEntry.queries("sample_reservoir_weighted")(spark, sf)
    val a = q.collect()
    assert(a.length === 50)
    assert(a.map(_.getAs[Long]("doc_id")).distinct.length === 50)
    assert(a.forall(_.getAs[Double]("skey") <= 0.0))
    val b = SparkEntry.queries("sample_reservoir_weighted")(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq, "sample not stable")
    // weighting by n_chars must bias the sample toward longer docs
    val corpusMean = graft.sources.Tables.t(spark, sf, "documents")
      .agg(avg(col("n_chars"))).head.getDouble(0)
    val sampleMean = a.map(_.getAs[Long]("w")).sum.toDouble / a.length
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean not above corpus mean $corpusMean")
  }

  test("text_c4_filters: planted rule-by-rule bitmask") {
    import spark.implicits._
    val docs = Seq(
      (1L, "This is a clean sentence with enough words here."), // mask 0
      (2L, "Short"),                       // <5 words (1) + no punct (16)
      (3L, "some code { return x; } follows here today."),      // brace (4)
      (4L, "Lorem Ipsum dolor sit amet consectetur adipiscing."), // (8)
      (5L, "a b c d e f g h i j k l.")     // mean word len < 3 -> (2)
    ).toDF("doc_id", "text")
    val out = operators.QRound9b.c4Filters(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("mask")).toMap
    assert(out(1L) === 0)
    assert(out(2L) === (1 + 16)) // 1 word (mean len 5 is in range)
    assert(out(3L) === 4)
    assert(out(4L) === 8)
    assert(out(5L) === 2)
    val drv = SparkEntry.queries("text_c4_filters")(spark, sf).collect()
    drv.foreach(r => assert(
      (r.getAs[Int]("mask") === 0) === r.getAs[Boolean]("keep")))
  }

  test("graph_bfs_distance: planted chain reaches exactly 4 hops") {
    import spark.implicits._
    val nodes = (0L to 12L).toDF("vec_id")
    // chain 4-5-6-...-12, symmetrized; sources are vec_id < 5
    val fwd = (4L until 12L).map(i => (i, i + 1)).toDF("src", "dst")
    val edges = fwd.unionByName(fwd.select(col("dst").as("src"),
      col("src").as("dst")))
    val out = operators.QRound9b.bfsDistance(nodes, edges).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("dist")).toMap
    (0L to 4L).foreach(i => assert(out(i) === 0, s"source $i"))
    (5L to 8L).foreach(i => assert(out(i) === (i - 4).toInt, s"chain $i"))
    (9L to 12L).foreach(i => assert(out(i) === -1, s"beyond horizon $i"))
  }

  test("mm_channel_stats: decode channel sums equal the synthesis formula") {
    for (id <- Seq(0L, 7L, 123L)) {
      val p = operators.Multimodal.synthPpm(id)
      val cs = operators.Multimodal.channelSums(p).get
      val w = 4 + (id % 5).toInt; val h = 3 + (id % 4).toInt
      assert(cs.width === w && cs.height === h)
      val expected = Array(0L, 0L, 0L)
      for (i <- 0 until w * h * 3) expected(i % 3) += (id * 31 + i * 7) % 256
      assert(Seq(cs.r_sum, cs.g_sum, cs.b_sum) === expected.toSeq,
        s"channel sums diverge from formula for id $id")
    }
    val drv = SparkEntry.queries("mm_channel_stats")(spark, sf).collect()
    assert(drv.length === 500)
    drv.foreach { r =>
      Seq("mean_r", "mean_g", "mean_b").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c out of [0,1]: $v")
      }
    }
  }
}
