package graft

import graft.operators.QRound9by

/** Round-9 wave-76 gates (SURVEY §2.28). */
class Round9bySpec extends SparkSpec {

  test("kalmanStep: constant series converges to the constant") {
    val st = QRound9by.kalmanStep(Seq.fill(50)(7L))
    assert(math.abs(st.head - 7.0) < 1e-9) // level locks on
    assert(st(2) === 0.0)                  // zero innovations
    // steady-state covariance of the local-level model (q=1, r=4):
    // P = (q + sqrt(q^2 + 4*q*r))/2 -> (1 + sqrt(17))/2, then
    // posterior p = (1-K)(P_prev+1) stays bounded below r
    assert(st(1) > 0.0 && st(1) < 4.0)
  }

  test("ts_kalman_local_level: level inside the data range, rms positive") {
    val out = SparkEntry.queries("ts_kalman_local_level")(spark, sf)
      .collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getAs[Long]("n") > 20)
      val l = r.getAs[Double]("level_final")
      assert(l > 0.0 && l < 1e5)
      assert(r.getAs[Double]("innovation_rms") > 0.0)
      assert(r.getAs[Double]("p_final") > 0.0)
    }
  }

  test("agg_gumbel_maxima: return levels ordered above the location") {
    val out = SparkEntry.queries("agg_gumbel_maxima")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getAs[Long]("n_weeks") >= 4)
      val mu = r.getAs[Double]("gumbel_mu")
      val beta = r.getAs[Double]("gumbel_beta")
      assert(beta >= 0.0)
      val r4 = r.getAs[Double]("ret_level_4w")
      val r12 = r.getAs[Double]("ret_level_12w")
      // longer return period -> higher level; both above the mode
      assert(r12 >= r4 - 1e-9)
      assert(r4 >= mu - 1e-9)
    }
  }

  test("dedup_tfidf_nn: every doc has a NON-NULL neighbor, cosine in [0,1], " +
    "no self loops") {
    // ADVICE r10: getAs[Long] silently unboxes a NULL neighbor to 0L, so
    // the old no-self-loop assert was vacuous on a NULL row. sf0.001 has
    // ZERO singleton dominant blocks (measured), so every row must carry
    // an explicit non-null neighbor; the singleton-NULL contract itself
    // is pinned by Round10Spec's fixture test.
    val out = SparkEntry.queries("dedup_tfidf_nn")(spark, sf).collect()
    assert(out.length === 500)
    out.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("nearest_doc")),
        s"doc ${r.getAs[Long]("doc_id")}: unexpected NULL neighbor")
      assert(!r.isNullAt(r.fieldIndex("cosine")))
      assert(r.getAs[Long]("doc_id") !== r.getAs[Long]("nearest_doc"))
      val c = r.getAs[Double]("cosine")
      assert(c >= 0.0 && c <= 1.0)
    }
  }
}
