package graft

/** Round-9 wave-73 gates (SURVEY §2.28). */
class Round9bvSpec extends SparkSpec {

  test("ts_mann_kendall: S bounded by pair count, verdict matches cut") {
    val out = SparkEntry.queries("ts_mann_kendall")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      val n = r.getAs[Long]("n")
      val s = r.getAs[Long]("s_stat")
      assert(math.abs(s) <= n * (n - 1) / 2)
      assert(r.getAs[Long]("var18") > 0)
      val z = r.getAs[Double]("z_score")
      assert(r.getAs[Int]("has_trend") === (if (math.abs(z) > 1.96) 1 else 0))
      assert(!r.getAs[Double]("sen_slope").isNaN)
    }
  }

  test("profile_wasserstein_1d: symmetric-free pairs, nonnegative, " +
    "identity-consistent") {
    val out = SparkEntry.queries("profile_wasserstein_1d")(spark, sf)
      .collect()
    assert(out.length === 10)
    out.foreach { r =>
      assert(r.getAs[String]("x_type") < r.getAs[String]("y_type"))
      assert(r.getAs[Double]("wasserstein_1d") >= 0.0)
    }
    // purchase values are an order of magnitude larger than clicks in
    // the fixtures only if distributions differ; at minimum not all
    // pairwise distances are zero
    assert(out.map(_.getAs[Double]("wasserstein_1d")).max > 0.0)
  }

  test("ts_variance_ratio: VR positive, verdict matches cut") {
    val out = SparkEntry.queries("ts_variance_ratio")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getAs[Long]("n_diffs") > 20)
      val vr = r.getAs[Double]("variance_ratio")
      assert(vr > 0.0 && vr < 10.0)
      val z = r.getAs[Double]("z_score")
      assert(r.getAs[Int]("rejects_rw") === (if (math.abs(z) > 1.96) 1 else 0))
    }
  }
}
