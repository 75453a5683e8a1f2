package graft

/** Round-9 wave-81 gates (SURVEY §2.28). */
class Round9cdSpec extends SparkSpec {

  test("ts_rolling_origin_cv: MAE bounds bias, origins counted") {
    val out = SparkEntry.queries("ts_rolling_origin_cv")(spark, sf)
      .collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getAs[Long]("n_origins") >= 5)
      val mae = r.getAs[Double]("mae")
      val bias = r.getAs[Double]("mean_bias")
      assert(mae >= 0.0)
      // |mean bias| can never exceed the mean absolute error
      assert(math.abs(bias) <= mae + 1e-6)
    }
  }

  test("profile_sentinel_audit: share consistent with counts") {
    val out = SparkEntry.queries("profile_sentinel_audit")(spark, sf)
      .collect()
    assert(out.map(_.getAs[String]("tbl")).toSeq ===
      Seq("documents", "events"))
    out.foreach { r =>
      val n = r.getAs[Long]("n_rows")
      assert(n > 0)
      val tot = r.getAs[Long]("empty_json") + r.getAs[Long]("blank_str") +
        r.getAs[Long]("nonpos_num")
      assert(tot >= 0 && tot <= 3 * n)
      val share = r.getAs[Double]("sentinel_share")
      assert(math.abs(share - math.floor(tot.toDouble / n * 1e4) / 1e4)
        < 1e-9)
    }
  }

  test("chp_standardized_rates: standardization stays within rate bounds") {
    val out = SparkEntry.queries("chp_standardized_rates")(spark, sf)
      .collect()
    assert(out.length === 2)
    assert(out.map(_.getAs[Int]("cohort")).toSeq === Seq(0, 1))
    out.foreach { r =>
      assert(r.getAs[Long]("n_users") > 0)
      val crude = r.getAs[Double]("crude_rate")
      val std = r.getAs[Double]("standardized_rate")
      assert(crude >= 0.0 && crude <= 1.0)
      assert(std >= 0.0 && std <= 1.0001)
      // mix adjustment is a reweighting of bucket rates, so it stays
      // within a loose band of the crude rate
      assert(math.abs(std - crude) < 0.5)
    }
  }
}
