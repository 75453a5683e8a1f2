package graft

/** Round-9 wave-68 gates (SURVEY §2.28). */
class Round9bqSpec extends SparkSpec {

  test("ts_granger_lag1: all 20 ordered pairs, verdict matches the cut") {
    val out = SparkEntry.queries("ts_granger_lag1")(spark, sf).collect()
    assert(out.length === 20)
    val pairs = out.map(r =>
      (r.getAs[String]("x_type"), r.getAs[String]("y_type"))).toSet
    assert(pairs.size === 20)
    out.foreach { r =>
      assert(r.getAs[String]("x_type") !== r.getAs[String]("y_type"))
      assert(r.getAs[Long]("n_obs") > 10)
      val f = r.getAs[Double]("f_stat")
      assert(!f.isNaN)
      assert(r.getAs[Int]("causal") === (if (f > 4.0) 1 else 0))
    }
  }

  test("graph_reciprocity: dyad census adds up") {
    val out = SparkEntry.queries("graph_reciprocity")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    val edges = r.getAs[Long]("n_edges")
    val recip = r.getAs[Long]("n_reciprocal")
    assert(edges > 0 && recip >= 0 && recip <= edges)
    assert(recip % 2 === 0) // reciprocal edges come in pairs
    assert(r.getAs[Long]("n_mutual_pairs") === recip / 2)
    assert(r.getAs[Long]("n_asymmetric") === edges - recip)
    val rho = r.getAs[Double]("reciprocity")
    assert(rho >= 0.0 && rho <= 1.0)
    assert(r.getAs[Long]("n_nodes") > 0)
  }

  test("text_burstiness: full vocab, VMR ordered and sane") {
    val out = SparkEntry.queries("text_burstiness")(spark, sf).collect()
    assert(out.length > 20)
    val scs = out.map(_.getAs[Long]("vmr_sc")).toSeq
    assert(scs === scs.sortBy(-_)) // emitted in descending burstiness
    out.foreach { r =>
      assert(r.getAs[Long]("df") > 0)
      assert(r.getAs[Long]("total_count") >= r.getAs[Long]("df"))
      val vmr = r.getAs[Double]("vmr")
      assert(vmr >= 0.0 && vmr < 1e4)
    }
  }
}
