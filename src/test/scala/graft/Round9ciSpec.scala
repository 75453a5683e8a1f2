package graft

/** Round-9 wave-86 gates (SURVEY §2.28). */
class Round9ciSpec extends SparkSpec {

  test("agg_spearman_rank: rho bounded, all types covered") {
    val out = SparkEntry.queries("agg_spearman_rank")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getAs[Long]("n_days") > 10)
      val rho = r.getAs[Double]("rho")
      assert(rho >= -1.0 - 1e-9 && rho <= 1.0 + 1e-9)
    }
  }

  test("ts_sample_entropy: A within B, entropy nonnegative") {
    val out = SparkEntry.queries("ts_sample_entropy")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      val a = r.getAs[Long]("a_cnt"); val b = r.getAs[Long]("b_cnt")
      assert(a <= b) // 3-matches are a subset of 2-prefix matches
      assert(r.getAs[Long]("r_tol") >= 0)
      if (!r.isNullAt(r.fieldIndex("sampen")))
        assert(r.getAs[Double]("sampen") >= 0.0) // ln(B/A), A ⊆ B
    }
  }

  test("graph_scc_hubs: components partition the hub set") {
    val out = SparkEntry.queries("graph_scc_hubs")(spark, sf).collect()
    assert(out.nonEmpty)
    // every hub lands in exactly one component
    assert(out.map(_.getAs[Long]("n_members")).sum <= 16L)
    out.foreach { r =>
      // id is the min member, so never above the max member
      assert(r.getAs[Long]("scc_id") <= r.getAs[Long]("max_member"))
      assert(r.getAs[Long]("n_members") >= 1L)
    }
    val ids = out.map(_.getAs[Long]("scc_id"))
    assert(ids.distinct.length === ids.length)
  }
}
