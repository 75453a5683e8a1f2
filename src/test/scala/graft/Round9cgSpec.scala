package graft

/** Round-9 wave-84 gates (SURVEY §2.28). */
class Round9cgSpec extends SparkSpec {

  test("chp_auc_exact: AUC in [0,1], counts partition") {
    val out = SparkEntry.queries("chp_auc_exact")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("npos") + r.getAs[Long]("nneg")
      === r.getAs[Long]("n"))
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
  }

  test("chp_decision_curve: monotone alarm counts, benefit below " +
    "prevalence bound") {
    val out = SparkEntry.queries("chp_decision_curve")(spark, sf).collect()
    assert(out.length === 6)
    val alarms = out.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fp"))
    // higher cuts alarm less
    assert(alarms.toSeq === alarms.sortBy(-_))
    out.foreach { r =>
      val nb = r.getAs[Double]("net_benefit")
      // net benefit never exceeds the prevalence (the perfect model)
      assert(nb <= 1.0 && nb >= -10.0)
      assert(!r.getAs[Double]("nb_treat_all").isNaN)
    }
  }

  test("ts_ljung_box: Q nonnegative, verdict matches cut") {
    val out = SparkEntry.queries("ts_ljung_box")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      val q = r.getAs[Double]("ljung_box_q")
      assert(q >= 0.0)
      assert(r.getAs[Int]("rejects_white_noise")
        === (if (q > 18.307) 1 else 0))
      assert(r.getAs[Long]("n_days") > 20)
    }
  }
}
