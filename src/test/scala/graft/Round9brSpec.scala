package graft

/** Round-9 wave-69 gates (SURVEY §2.28). */
class Round9brSpec extends SparkSpec {

  test("ts_permutation_entropy: normalized, patterns bounded by 6") {
    val out = SparkEntry.queries("ts_permutation_entropy")(spark, sf)
      .collect()
    assert(out.length === 5)
    out.foreach { r =>
      val np = r.getAs[Long]("n_patterns")
      assert(np >= 1 && np <= 6)
      val h = r.getAs[Double]("perm_entropy_norm")
      assert(h >= 0.0 && h <= 1.0001)
      val share = r.getAs[Double]("max_share")
      assert(share >= 1.0 / 6.0 - 1e-4 && share <= 1.0)
      // max entropy only with all patterns present
      if (np < 6) assert(h < 1.0)
      assert(r.getAs[Long]("n_windows") > 10)
    }
  }

  test("graph_katz_centrality: exact top-10, scores ordered, >= 1") {
    val out = SparkEntry.queries("graph_katz_centrality")(spark, sf)
      .collect()
    assert(out.length === 10)
    assert(out.map(_.getAs[Int]("rnk")).toSeq === (1 to 10))
    val scores = out.map(_.getAs[Double]("katz_score")).toSeq
    assert(scores === scores.sortBy(-_))
    // x_4 = 1 + alpha * (neighbor mass) >= 1 always
    scores.foreach(sc => assert(sc >= 1.0))
    assert(out.map(_.getAs[Long]("node")).distinct.length === 10)
  }

  test("text_ttr_sttr: one row per doc, ratios in (0,1], chunks coherent") {
    val out = SparkEntry.queries("text_ttr_sttr")(spark, sf).collect()
    assert(out.length === 500)
    out.foreach { r =>
      val nt = r.getAs[Long]("n_tokens"); val ty = r.getAs[Long]("n_types")
      assert(ty >= 1 && ty <= nt)
      val ttr = r.getAs[Double]("ttr")
      assert(ttr > 0.0 && ttr <= 1.0)
      val nc = r.getAs[Long]("n_chunks")
      assert(nc === nt / 25)
      if (nc == 0) assert(r.isNullAt(r.fieldIndex("sttr")))
      else {
        val sttr = r.getAs[Double]("sttr")
        assert(sttr > 0.0 && sttr <= 1.0)
      }
    }
  }
}
