package graft

/** Round-9 wave-75 gates (SURVEY §2.28). */
class Round9bxSpec extends SparkSpec {

  test("ts_cointegration_egr: 20 ordered pairs, ADF negative-leaning, " +
    "verdict matches cut") {
    val out = SparkEntry.queries("ts_cointegration_egr")(spark, sf)
      .collect()
    assert(out.length === 20)
    out.foreach { r =>
      assert(r.getAs[Long]("n_obs") > 10)
      val t = r.getAs[Double]("adf_t")
      assert(!t.isNaN)
      assert(r.getAs[Int]("cointegrated") === (if (t < -1.95) 1 else 0))
      assert(!r.getAs[Double]("beta").isNaN)
    }
    // stationary count-series residuals mean-revert strongly: at least
    // one pair should reject the unit root
    assert(out.map(_.getAs[Int]("cointegrated")).sum >= 1)
  }

  test("mm_hist_emd_outliers: top-10 ranked descending, bounded norm") {
    val out = SparkEntry.queries("mm_hist_emd_outliers")(spark, sf)
      .collect()
    assert(out.length === 10)
    assert(out.map(_.getAs[Int]("rnk")).toSeq === (1 to 10))
    val scs = out.map(_.getAs[Long]("emd_sc")).toSeq
    assert(scs === scs.sortBy(-_))
    out.foreach { r =>
      assert(r.getAs[Long]("emd_sc") >= 0)
      val norm = r.getAs[Double]("emd_norm")
      // EMD between two normalized 16-bin histograms is <= 15 (max
      // displacement), scale-normalized here to <= ~1
      assert(norm >= 0.0 && norm < 1.0)
    }
  }

  test("chp_user_entropy: buckets cover the user base, entropies sane") {
    val out = SparkEntry.queries("chp_user_entropy")(spark, sf).collect()
    assert(out.nonEmpty)
    val totalUsers = out.map(_.getAs[Long]("n_users")).sum
    assert(totalUsers > 10)
    out.foreach { r =>
      val h = r.getAs[Double]("mean_entropy")
      // 5 event types -> entropy in [0, ln 5]
      assert(h >= 0.0 && h <= math.log(5.0) + 1e-6)
      val b = r.getAs[Int]("bucket")
      // mean of the bucket lies inside the bucket's 0.01-nat span
      assert(h >= b * 0.01 - 1e-9 && h < (b + 1) * 0.01 + 1e-9)
    }
  }
}
