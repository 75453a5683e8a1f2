package graft

/** Round-9 wave-80 gates (SURVEY §2.28). */
class Round9ccSpec extends SparkSpec {

  test("chp_markov_removal: shares sum to 1, removal only hurts") {
    val out = SparkEntry.queries("chp_markov_removal")(spark, sf).collect()
    assert(out.map(_.getAs[String]("channel")).toSeq ===
      Seq("click", "error", "signup", "view"))
    val pFull = out.map(_.getAs[Double]("p_conversion")).distinct
    assert(pFull.length === 1 && pFull.head > 0.0 && pFull.head <= 1.0)
    var shareSum = 0.0
    out.foreach { r =>
      val eff = r.getAs[Double]("removal_effect")
      assert(eff >= 0.0) // knocking out a state cannot help conversion
      assert(eff <= pFull.head + 1e-9)
      shareSum += r.getAs[Double]("attribution_share")
    }
    assert(math.abs(shareSum - 1.0) < 1e-3) // trunc4 x4 rounding slack
  }

  test("ts_season_length_detect: lag in range, best >= weekly acf") {
    val out = SparkEntry.queries("ts_season_length_detect")(spark, sf)
      .collect()
    assert(out.length === 5)
    out.foreach { r =>
      val lag = r.getAs[Int]("best_lag")
      assert(lag >= 2 && lag <= 10)
      val best = r.getAs[Double]("acf_best")
      val week = r.getAs[Double]("acf_week")
      assert(best >= week - 1e-9) // argmax dominates the lag-7 probe
      assert(best >= -1.0 && best <= 1.0)
    }
  }

  test("agg_trimmed_mean: robust means bracketed by construction") {
    val out = SparkEntry.queries("agg_trimmed_mean")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      val n = r.getAs[Long]("n")
      val nt = r.getAs[Long]("n_trim")
      // middle 80%: between 70% and 90% of rows survive (interpolated
      // boundaries + small groups)
      assert(nt >= (n * 7) / 10 && nt <= n)
      val raw = r.getAs[Double]("raw_mean")
      val tr = r.getAs[Double]("trimmed_mean")
      val wi = r.getAs[Double]("winsorized_mean")
      assert(raw > 0 && tr > 0 && wi > 0)
      // winsorized lies between trimmed and raw in heavy-tail direction
      // only loosely: just sanity-band them
      assert(math.abs(tr - raw) / raw < 0.5)
      assert(math.abs(wi - raw) / raw < 0.5)
    }
  }
}
