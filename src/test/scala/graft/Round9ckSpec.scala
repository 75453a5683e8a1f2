package graft

/** Round-9 wave-88 gates (SURVEY §2.28). */
class Round9ckSpec extends SparkSpec {

  test("chp_brier_decomp: Murphy identity holds on the binned terms") {
    val out = SparkEntry.queries("chp_brier_decomp")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    val rel = r.getAs[Double]("reliability")
    val res = r.getAs[Double]("resolution")
    val unc = r.getAs[Double]("uncertainty")
    val b = r.getAs[Double]("brier_binned")
    assert(rel >= 0.0 && res >= 0.0)
    assert(unc >= 0.0 && unc <= 0.25 + 1e-9) // y(1-y) peaks at 1/4
    assert(math.abs(rel - res + unc - b) < 1e-4)
    // resolution never exceeds the outcome variance
    assert(res <= unc + 1e-6)
  }

  test("ts_dickey_fuller: verdict consistent, beta finite") {
    val out = SparkEntry.queries("ts_dickey_fuller")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getAs[Long]("n_obs") > 10L)
      val t = r.getAs[Double]("t_df")
      val expect = if (t < -2.86) 1 else 0
      assert(r.getAs[Int]("reject_unit_root") === expect)
      // a mean-reverting daily count series has nonpositive slope
      assert(r.getAs[Double]("beta") <= 0.0 + 1e-9)
    }
  }

  test("sample_contrastive_pairs: triplets well-formed") {
    val out = SparkEntry.queries("sample_contrastive_pairs")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val a = r.getAs[Long]("anchor_id")
      assert(a % 20 === 0L)
      assert(r.getAs[Long]("pos_id") !== a) // cyclic next, never self
      val m = r.getAs[Double]("margin")
      assert(math.abs(m - (r.getAs[Double]("pos_sim")
        - r.getAs[Double]("neg_sim"))) < 1e-9)
    }
    // positives come from the anchor's own cell: margins mostly positive
    val margins = out.map(_.getAs[Double]("margin"))
    assert(margins.count(_ > 0) * 2 > margins.length)
  }
}
