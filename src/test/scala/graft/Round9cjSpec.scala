package graft

/** Round-9 wave-87 gates (SURVEY §2.28). */
class Round9cjSpec extends SparkSpec {

  test("agg_anova_f: moments partition, F and eta2 sane") {
    val out = SparkEntry.queries("agg_anova_f")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("k_groups") === 5L)
    assert(r.getAs[Long]("n_total") > 100L)
    assert(r.getAs[Double]("f_stat") >= 0.0)
    val eta = r.getAs[Double]("eta_sq")
    assert(eta >= 0.0 && eta <= 1.0)
    // verdict is consistent with the statistic
    val expect = if (r.getAs[Double]("f_stat") > 2.372) 1 else 0
    assert(r.getAs[Int]("reject_5pct") === expect)
  }

  test("mm_image_bit_planes: plane counts bounded by the byte count") {
    val out = SparkEntry.queries("mm_image_bit_planes")(spark, sf).collect()
    assert(out.length === 500)
    out.foreach { r =>
      val n = r.getAs[Long]("n_bytes")
      assert(n >= 36L && n <= 144L) // 4..8 × 3..6 × 3 channels
      (0 to 7).foreach { b =>
        val c = r.getAs[Long](s"p$b")
        assert(c >= 0L && c <= n)
      }
      // the ramp plane always flips the low bit somewhere
      assert(r.getAs[Long]("p0") > 0L && r.getAs[Long]("p0") < n)
    }
  }

  test("emb_silhouette_simplified: cells cover the corpus, s in [0,1]") {
    val out = SparkEntry.queries("emb_silhouette_simplified")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    val total = out.map(_.getAs[Long]("n_vec")).sum
    assert(total === 500L) // sf0.001 embedding count — every vector lands
    out.foreach { r =>
      val m = r.getAs[Double]("mean_sil")
      // (b-a)/b with a ≤ b is always in [0,1]
      assert(m >= 0.0 && m <= 1.0)
    }
  }
}
