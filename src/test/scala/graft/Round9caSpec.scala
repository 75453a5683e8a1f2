package graft

/** Round-9 wave-78 gates (SURVEY §2.28). */
class Round9caSpec extends SparkSpec {

  test("chp_causal_impact_lite: window split coherent, verdict matches cut") {
    val out = SparkEntry.queries("chp_causal_impact_lite")(spark, sf)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_pre") === 20L)
    assert(r.getAs[Long]("n_post") > 0)
    val z = r.getAs[Double]("z_score")
    assert(!z.isNaN)
    assert(r.getAs[Int]("significant") === (if (math.abs(z) > 1.96) 1 else 0))
    assert(!r.getAs[Double]("beta").isNaN)
  }

  test("ts_spectral_entropy: normalized entropy and dominant share coherent") {
    val out = SparkEntry.queries("ts_spectral_entropy")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      val nb = r.getAs[Long]("n_bands")
      assert(nb >= 1 && nb <= 8)
      val h = r.getAs[Double]("spectral_entropy_norm")
      assert(h >= 0.0 && h <= 1.0001)
      val share = r.getAs[Double]("dominant_band_share")
      assert(share >= 1.0 / nb - 1e-4 && share <= 1.0)
      // concentrated spectrum => low entropy: if one band dominates
      // heavily the entropy cannot be near max
      if (share > 0.9) assert(h < 0.5)
    }
  }

  test("emb_mmd_rbf: 45 pairs, small nonneg-leaning MMD") {
    val out = SparkEntry.queries("emb_mmd_rbf")(spark, sf).collect()
    assert(out.length === 45)
    out.foreach { r =>
      assert(r.getAs[Int]("l1") < r.getAs[Int]("l2"))
      val m = r.getAs[Double]("mmd2")
      // biased-over-distinct-pairs estimator can dip slightly negative
      assert(m > -0.05 && m < 2.0)
    }
  }
}
