package graft

/** Round-9 wave-67 gates (SURVEY §2.28). */
class Round9bpSpec extends SparkSpec {

  test("ts_pacf_durbin: five series, bounded partial correlations") {
    val out = SparkEntry.queries("ts_pacf_durbin")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getAs[Long]("n_days") > 20)
      val ps = (1 to 5).map(k => r.getAs[Double](s"pacf$k"))
      ps.foreach(p => assert(!p.isNaN))
      // lag-1 PACF == lag-1 ACF, a proper correlation
      assert(math.abs(ps.head) <= 1.000001)
      // higher lags: sample PACF stays in a loosely bounded band
      ps.tail.foreach(p => assert(math.abs(p) <= 1.5))
    }
  }

  test("serve_rate_limit_audit: only breaching users, coherent profile") {
    val out = SparkEntry.queries("serve_rate_limit_audit")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("peak_rolling") > 28)
      assert(r.getAs[Long]("n_breaches") >= 1)
      assert(r.getAs[Long]("n_events") >= r.getAs[Long]("peak_rolling"))
      assert(!r.isNullAt(r.fieldIndex("first_breach_sec")))
    }
  }

  test("agg_cramers_v: 5x7 table, correction shrinks V") {
    val out = SparkEntry.queries("agg_cramers_v")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("r") === 5L)
    assert(r.getAs[Long]("c") === 7L)
    assert(r.getAs[Double]("chi2") >= 0.0)
    val v = r.getAs[Double]("cramers_v")
    val vc = r.getAs[Double]("cramers_v_corrected")
    assert(v >= 0.0 && v <= 1.0)
    assert(vc >= 0.0 && vc <= v + 1e-9)
  }
}
