package graft

/** Round-9 wave-71 gates (SURVEY §2.28). */
class Round9btSpec extends SparkSpec {

  test("ts_hurst_rs: estimates in a plausible band") {
    val out = SparkEntry.queries("ts_hurst_rs")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getAs[Long]("n_blocks") >= 6) // 6+3+2 at 30 days
      val h = r.getAs[Double]("hurst_rs")
      // R/S estimates live in (0, 1.5) even on short series
      assert(h > 0.0 && h < 1.5)
    }
  }

  test("emb_jl_projection: distortion concentrated around 1") {
    val out = SparkEntry.queries("emb_jl_projection")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_pairs") > 1000)
    val mean = r.getAs[Double]("mean_ratio")
    val mn = r.getAs[Double]("min_ratio")
    val mx = r.getAs[Double]("max_ratio")
    assert(mn <= mean && mean <= mx)
    // JL with 16 dims: mean ratio near 1, tails within a loose band
    assert(mean > 0.7 && mean < 1.3)
    assert(mn > 0.0 && mx < 4.0)
  }

  test("chp_gini_stump: exactly one best split, counts monotone") {
    val out = SparkEntry.queries("chp_gini_stump")(spark, sf).collect()
    assert(out.length === 8)
    assert(out.map(_.getAs[Int]("is_best")).sum === 1)
    val nle = out.map(_.getAs[Long]("n_le")).toSeq
    assert(nle === nle.sorted) // thresholds ascending -> n_le monotone
    out.foreach { r =>
      assert(r.getAs[Long]("n_pos_le") <= r.getAs[Long]("n_le"))
      val g = r.getAs[Double]("gini_weighted")
      assert(g >= 0.0 && g <= 0.5 + 1e-9)
    }
  }
}
