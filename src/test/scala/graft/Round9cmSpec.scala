package graft

/** Round-9 wave-90 gates (SURVEY §2.28). */
class Round9cmSpec extends SparkSpec {

  test("agg_jarque_bera: verdict matches statistic, JB nonnegative") {
    val out = SparkEntry.queries("agg_jarque_bera")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      val jb = r.getAs[Double]("jb_stat")
      assert(jb >= 0.0)
      val expect = if (jb > 5.991) 1 else 0
      assert(r.getAs[Int]("reject_normal_5pct") === expect)
      // excess kurtosis is bounded below by -2 for any distribution
      assert(r.getAs[Double]("excess_kurtosis") >= -2.0 - 1e-9)
    }
  }

  test("ts_turning_points: count bounded by interior days") {
    val out = SparkEntry.queries("ts_turning_points")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      val n = r.getAs[Long]("n_days")
      val t = r.getAs[Long]("t_pts")
      assert(t >= 0L && t <= n - 2)
      val expect = if (math.abs(r.getAs[Double]("z_score")) <= 1.96) 1
        else 0
      assert(r.getAs[Int]("random_5pct") === expect)
    }
  }

  test("ts_sma_crossover: signal side defined, crossings bounded") {
    val out = SparkEntry.queries("ts_sma_crossover")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      val n = r.getAs[Long]("n_eval")
      val c = r.getAs[Long]("n_cross")
      assert(c >= 0L && c < n)
      assert(math.abs(r.getAs[Long]("final_signal")) <= 1L)
      if (c > 0) assert(!r.isNullAt(r.fieldIndex("last_cross_day")))
      else assert(r.isNullAt(r.fieldIndex("last_cross_day")))
    }
  }
}
