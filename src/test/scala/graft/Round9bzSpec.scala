package graft

/** Round-9 wave-77 gates (SURVEY §2.28). */
class Round9bzSpec extends SparkSpec {

  test("graph_bootstrap_percolation: monotone cascade, rounds complete") {
    val out = SparkEntry.queries("graph_bootstrap_percolation")(spark, sf)
      .collect()
    assert(out.length === 5)
    assert(out.map(_.getAs[Int]("round")).toSeq === (0 to 4))
    val actives = out.map(_.getAs[Long]("n_active")).toSeq
    assert(actives === actives.sorted) // activation never shrinks
    assert(actives.head > 0)           // seeds exist
    out.foreach { r =>
      assert(r.getAs[Long]("n_new") >= 0)
    }
    // n_new telescopes into n_active
    assert(out.map(_.getAs[Long]("n_new")).sum === actives.last)
  }

  test("agg_benjamini_hochberg: rank permutation, monotone p, " +
    "step-up verdicts contiguous") {
    val out = SparkEntry.queries("agg_benjamini_hochberg")(spark, sf)
      .collect()
    assert(out.length === 20)
    assert(out.map(_.getAs[Int]("rank")).toSeq === (1 to 20))
    val ps = out.map(_.getAs[Double]("p_value")).toSeq
    assert(ps === ps.sorted)
    ps.foreach(p => assert(p >= 0.0 && p <= 1.0))
    // BH rejects a prefix of the sorted p-values
    val sig = out.map(_.getAs[Int]("significant")).toSeq
    val k = sig.count(_ == 1)
    assert(sig === Seq.fill(k)(1) ++ Seq.fill(20 - k)(0))
  }

  test("mm_audio_spectral_flatness: flatness in (0, 1]") {
    val out = SparkEntry.queries("mm_audio_spectral_flatness")(spark, sf)
      .collect()
    assert(out.length === 500)
    out.foreach { r =>
      assert(r.getAs[Long]("n_bands") >= 1 && r.getAs[Long]("n_bands") <= 8)
      val f = r.getAs[Double]("spectral_flatness")
      // AM-GM: geometric mean <= arithmetic mean
      assert(f > 0.0 && f <= 1.0 + 1e-9)
    }
  }
}
