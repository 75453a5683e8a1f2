package graft

/** Round-9 wave-43 gates (SURVEY §2.28). */
class Round9arSpec extends SparkSpec {

  test("sim_coverage_eval: coverage is a sane fraction and max-sim bounded") {
    val out = SparkEntry.queries("sim_coverage_eval")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    val total = r.getAs[Long]("n_total")
    val covered = r.getAs[Long]("n_covered")
    assert(total > 0 && covered >= 0 && covered <= total)
    val cov = r.getAs[Double]("coverage")
    assert(cov >= 0.0 && cov <= 1.0)
    // 16 reps on a clustered corpus must cover a nontrivial share
    assert(cov > 0.1)
    val mms = r.getAs[Double]("mean_max_sim")
    assert(mms >= -1.0 && mms <= 1.0)
    // the mean of the max-sims must not exceed 1 nor sit below the
    // covered fraction times the threshold
    assert(mms >= cov * 0.2 - 1.0)
  }

  test("ts_dispersion_fano: Fano factor is nonnegative with exact moments") {
    val out = SparkEntry.queries("ts_dispersion_fano")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_hours") > 0)
      assert(r.getAs[Double]("mean_rate") > 0.0)
      // variance/mean of counts is >= 0 by construction
      assert(r.getAs[Double]("fano") >= 0.0)
    }
    // ordered by event_type
    val types = out.map(_.getAs[String]("event_type")).toSeq
    assert(types === types.sorted)
  }

  test("chp_power_mde: required n shrinks quadratically with the MDE") {
    val out = SparkEntry.queries("chp_power_mde")(spark, sf).collect()
    assert(out.length === 3)
    val byMde = out.sortBy(_.getAs[Long]("mde_pp"))
    val ns = byMde.map(_.getAs[Long]("n_per_arm"))
    // monotone decreasing in the MDE
    assert(ns.toSeq === ns.sortBy(-_).toSeq)
    // quadratic shape: halving the MDE ~quadruples n (1pp vs 2pp)
    assert(ns(0) > ns(1) * 3 && ns(0) < ns(1) * 5)
    val p = byMde.head.getAs[Double]("base_rate")
    assert(p > 0.0 && p < 1.0)
    byMde.foreach { r =>
      val feas = r.getAs[Int]("feasible")
      val ok = r.getAs[Long]("n_per_arm") * 2 <= r.getAs[Long]("n_users")
      assert(feas === (if (ok) 1 else 0))
    }
  }
}
