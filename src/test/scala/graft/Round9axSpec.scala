package graft

/** Round-9 wave-49 gates (SURVEY §2.28). */
class Round9axSpec extends SparkSpec {

  test("ts_burst_hysteresis: episode accounting is internally consistent") {
    val out = SparkEntry.queries("ts_burst_hysteresis")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      val n = r.getAs[Long]("n_hours")
      val burst = r.getAs[Long]("n_burst_hours")
      val eps = r.getAs[Long]("n_episodes")
      val maxLen = r.getAs[Long]("max_episode_len")
      assert(n > 0 && burst >= 0 && burst <= n)
      // every episode has at least one hour; the longest fits the total
      assert(eps <= burst && maxLen <= burst)
      if (eps > 0) assert(maxLen >= 1 && maxLen >= burst / eps)
      else assert(burst === 0 && maxLen === 0)
      val share = r.getAs[Double]("burst_share")
      assert(share >= 0.0 && share <= 1.0)
    }
  }

  test("chp_ratio_metric_ci: CI brackets the ratio, SE positive") {
    val out = SparkEntry.queries("chp_ratio_metric_ci")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n") > 0)
    val ratio = r.getAs[Double]("ratio")
    val se = r.getAs[Double]("se")
    assert(ratio > 0.0 && se > 0.0)
    assert(r.getAs[Double]("ci_lo") < ratio && ratio < r.getAs[Double]("ci_hi"))
    // the CI is symmetric up to the trunc4 cuts
    val width = r.getAs[Double]("ci_hi") - r.getAs[Double]("ci_lo")
    assert(math.abs(width - 2 * 1.96 * se) < 3e-4)
  }

  test("maint_backfill_plan: chunks bounded at 7 days, ranges well-formed") {
    val out = SparkEntry.queries("maint_backfill_plan")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nd = r.getAs[Long]("n_days")
      assert(nd >= 1 && nd <= 7)
      assert(r.getAs[Long]("n_events") > 0)
      val s = r.getAs[String]("start_date"); val e = r.getAs[String]("end_date")
      assert(s <= e)
      // a chunk of n days spans exactly n calendar days
      val sd = java.time.LocalDate.parse(s)
      val ed = java.time.LocalDate.parse(e)
      assert(java.time.temporal.ChronoUnit.DAYS.between(sd, ed) === nd - 1)
    }
  }
}
