package graft

/** Round-9 wave-52 gates (SURVEY §2.28). */
class Round9baSpec extends SparkSpec {

  test("ts_kpss_stat: statistic positive, verdict consistent") {
    val out = SparkEntry.queries("ts_kpss_stat")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getAs[Long]("n_days") > 1)
      val stat = r.getAs[Double]("kpss_stat")
      assert(stat > 0.0)
      assert(r.getAs[Int]("nonstationary") ===
        (if (stat > 0.463) 1 else 0))
      // a flat synthetic arrival series should not wildly trend
      assert(stat < 10.0)
    }
  }

  test("sample_gof_check: expectations add up, sample is fair") {
    val out = SparkEntry.queries("sample_gof_check")(spark, sf).collect()
    val (tot, cells) = out.partition(_.getAs[String]("lang") == "_TOTAL")
    assert(tot.length === 1 && cells.nonEmpty)
    val t = tot.head
    val nObsTotal = cells.map(_.getAs[Long]("n_obs")).sum
    assert(t.getAs[Long]("n_obs") === nObsTotal)
    // expected counts sum to the sample size (they're proportional)
    val expSum = cells.map(_.getAs[Double]("metric")).sum
    assert(math.abs(expSum - nObsTotal) < 0.01)
    // the md5 hash is a fair sampler: chi2 must not trip the 5% gate
    assert(t.getAs[Double]("metric") >= 0.0)
    assert(t.getAs[Int]("flag") === 0)
  }

  test("chp_growth_accounting: bridge reconstructs the delta exactly") {
    val out = SparkEntry.queries("chp_growth_accounting")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("users_pre") > 0 && r.getAs[Long]("users_post") > 0)
    assert(r.getAs[Double]("rev_pre") > 0 && r.getAs[Double]("rev_post") > 0)
    val delta = r.getAs[Double]("delta_rev")
    val bridge = r.getAs[Double]("user_effect") + r.getAs[Double]("arpu_effect")
    // exact identity up to the three independent trunc4 cuts
    assert(math.abs(bridge - delta) < 3e-4 * math.max(1.0, math.abs(delta)))
  }
}
