package graft

/** Round-9 wave-82 gates (SURVEY §2.28). */
class Round9ceSpec extends SparkSpec {

  test("serve_consistent_hash: all keys assigned, ~1/5 move on join") {
    val out = SparkEntry.queries("serve_consistent_hash")(spark, sf)
      .collect()
    assert(out.length === 4)
    val total = out.map(_.getAs[Long]("n_keys")).sum
    assert(total > 0)
    val moved = out.map(_.getAs[Long]("n_moved")).sum
    // the consistent-hashing guarantee: only keys whose successor arc
    // is claimed by the new server move — expect well under half,
    // centered near 1/5
    assert(moved.toDouble / total < 0.5)
    assert(moved > 0) // some keys always move
    out.foreach { r =>
      assert(r.getAs[Long]("n_moved") <= r.getAs[Long]("n_keys"))
      val share = r.getAs[Double]("share")
      assert(share > 0.0 && share < 1.0)
    }
  }

  test("ts_vwap_daily: vwap within price bounds") {
    val out = SparkEntry.queries("ts_vwap_daily")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("volume") >= r.getAs[Long]("n_lines"))
      val vwap = r.getAs[Double]("vwap")
      assert(vwap > 0.0 && vwap < 1e6)
    }
  }

  test("profile_hill_diversity: Hill numbers ordered q0 >= q1 >= q2") {
    val out = SparkEntry.queries("profile_hill_diversity")(spark, sf)
      .collect()
    assert(out.length === 5)
    out.foreach { r =>
      val q0 = r.getAs[Long]("hill_q0").toDouble
      val q1 = r.getAs[Double]("hill_q1")
      val q2 = r.getAs[Double]("hill_q2")
      // Hill numbers are non-increasing in q for any distribution
      assert(q0 >= q1 - 1e-4)
      assert(q1 >= q2 - 1e-4)
      assert(q2 >= 1.0 - 1e-4)
    }
  }
}
