package graft

/** Round-9 wave-50 gates (SURVEY §2.28). */
class Round9aySpec extends SparkSpec {

  test("emb_centroid_drift: halves partition the corpus, drift small") {
    val out = SparkEntry.queries("emb_centroid_drift")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    val total = sources.Tables.t(spark, sf, "embeddings").count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") === total)
    // the cloud is near-zero-mean, so the half-centroid cosine is only
    // bounded, not near 1 — the informative signal is the L2 shift
    val cos = r.getAs[Double]("centroid_cos")
    assert(cos >= -1.0 && cos <= 1.0)
    assert(r.getAs[Double]("l2_shift") >= 0.0)
    // two random halves of one corpus shift far less than a unit vector
    assert(r.getAs[Double]("l2_shift") < 0.5)
    val wd = r.getAs[Long]("worst_dim")
    assert(wd >= 0 && wd < 64)
    // the worst per-dim shift cannot exceed the whole L2 shift
    assert(r.getAs[Double]("worst_shift") <= r.getAs[Double]("l2_shift") + 1e-4)
  }

  test("mm_video_motion: totals consistent, peak pair in range") {
    val out = SparkEntry.queries("mm_video_motion")(spark, sf).collect()
    assert(out.length === 500)
    out.foreach { r =>
      val nf = r.getAs[Int]("n_frames")
      assert(nf >= 2 && nf <= 5)
      assert(r.getAs[Long]("motion_total") > 0)
      val mean = r.getAs[Double]("mean_motion")
      val peak = r.getAs[Double]("peak_motion")
      assert(mean > 0.0 && mean <= 1.0)
      // the peak transition is at least the mean transition
      assert(peak >= mean - 1e-4 && peak <= 1.0)
      val pp = r.getAs[Long]("peak_pair")
      assert(pp >= 0 && pp < nf - 1)
    }
  }

  test("serve_cache_plan: hit ratio monotone in capacity, mass exact") {
    val out = SparkEntry.queries("serve_cache_plan")(spark, sf).collect()
    assert(out.length === 3)
    val byC = out.sortBy(_.getAs[Long]("capacity"))
    assert(byC.map(_.getAs[Long]("capacity")).toSeq === Seq(8L, 32L, 128L))
    val ratios = byC.map(_.getAs[Double]("hit_ratio"))
    // larger cache never hits less
    assert(ratios.toSeq === ratios.sorted.toSeq)
    ratios.foreach(x => assert(x > 0.0 && x <= 1.0))
    byC.foreach { r =>
      assert(r.getAs[Long]("hit_mass") <= r.getAs[Long]("total"))
      // capacity beyond the key count means every request hits
      if (r.getAs[Long]("capacity") >= r.getAs[Long]("n_keys"))
        assert(r.getAs[Double]("hit_ratio") === 1.0 ||
          r.getAs[Double]("hit_ratio") >= 0.9999)
    }
  }
}
