package graft

import graft.operators.QRound9bs

/** Round-9 wave-70 gates (SURVEY §2.28). */
class Round9bsSpec extends SparkSpec {

  test("dtwBanded: hand-checked fixtures") {
    // identical series warp for free
    assert(QRound9bs.dtwBanded(Array(1L, 2L, 3L), Array(1L, 2L, 3L), 10)
      === 0L)
    // single-element vs series: all steps pay |x - y|
    assert(QRound9bs.dtwBanded(Array(5L), Array(1L, 2L, 3L), 10)
      === 4L + 3L + 2L)
    // classic elastic match: shifted step pattern aligns cheaply
    assert(QRound9bs.dtwBanded(Array(0L, 0L, 5L, 5L), Array(0L, 5L, 5L, 5L),
      10) === 0L)
    // monotone mismatch: hand-computed DP
    // xs=[0,3], ys=[1,2]: d=|0-1|=1; best path 1 + min(...) -> total 2
    assert(QRound9bs.dtwBanded(Array(0L, 3L), Array(1L, 2L), 10) === 2L)
  }

  test("ts_dtw_distance: 10 pairs, nonnegative, normalized coherently") {
    val out = SparkEntry.queries("ts_dtw_distance")(spark, sf).collect()
    assert(out.length === 10)
    out.foreach { r =>
      assert(r.getAs[String]("x_type") < r.getAs[String]("y_type"))
      val cost = r.getAs[Long]("dtw_cost")
      assert(cost >= 0)
      val n = r.getAs[Long]("n_x") + r.getAs[Long]("n_y")
      val per = r.getAs[Double]("dtw_per_step")
      assert(math.abs(per - math.floor(cost.toDouble / n * 1e4) / 1e4)
        < 1e-9)
    }
  }

  test("chp_adstock_ols: four channels, r2 in [0,1]") {
    val out = SparkEntry.queries("chp_adstock_ols")(spark, sf).collect()
    assert(out.map(_.getAs[String]("channel")).toSeq ===
      Seq("click", "error", "signup", "view"))
    out.foreach { r =>
      assert(r.getAs[Long]("n_obs") > 10)
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0)
      assert(!r.getAs[Double]("slope_per_click").isNaN)
    }
  }

  test("emb_energy_distance: 45 label pairs, symmetric-clean, near-zero " +
    "for same-distribution clouds only if small") {
    val out = SparkEntry.queries("emb_energy_distance")(spark, sf).collect()
    assert(out.length === 45)
    out.foreach { r =>
      assert(r.getAs[Int]("l1") < r.getAs[Int]("l2"))
      assert(r.getAs[Long]("na") > 0 && r.getAs[Long]("nb") > 0)
      // sample U-statistic can dip slightly negative for
      // identically-distributed clouds; bound the dip
      assert(r.getAs[Double]("energy_dist") >= -0.05)
    }
  }
}
