package graft

/** Round-9 wave-89 gates (SURVEY §2.28). */
class Round9clSpec extends SparkSpec {

  test("agg_levene_bf: F nonnegative, verdict consistent") {
    val out = SparkEntry.queries("agg_levene_bf")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("k_groups") === 5L)
    val f = r.getAs[Double]("f_bf")
    assert(f >= 0.0)
    val expect = if (f > 2.372) 1 else 0
    assert(r.getAs[Int]("reject_5pct") === expect)
  }

  test("graph_local_bridges: tallies partition the edge set") {
    val out = SparkEntry.queries("graph_local_bridges")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    val e = r.getAs[Long]("n_edges")
    val te = r.getAs[Long]("n_tri_edges")
    val b = r.getAs[Long]("n_local_bridges")
    assert(e > 0L)
    // triangle edges + bridges exactly partition the edges
    assert(te + b === e)
    val share = r.getAs[Double]("bridge_share")
    assert(share >= 0.0 && share <= 1.0)
  }

  test("text_heaps_law_fit: sublinear growth, strong fit") {
    val out = SparkEntry.queries("text_heaps_law_fit")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_points") === 8L)
    val beta = r.getAs[Double]("beta")
    // vocabulary grows, but sublinearly — the Heaps regime
    assert(beta > 0.0 && beta < 1.0)
    assert(r.getAs[Double]("k_coef") > 0.0)
    val r2 = r.getAs[Double]("r_sq")
    assert(r2 > 0.8 && r2 <= 1.0 + 1e-9) // log-log fit should be tight
  }
}
