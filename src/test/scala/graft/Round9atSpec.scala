package graft

/** Round-9 wave-45 gates (SURVEY §2.28). */
class Round9atSpec extends SparkSpec {

  test("emb_uniformity_metric: potential bounds and pair sampling sane") {
    val out = SparkEntry.queries("emb_uniformity_metric")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    val n = r.getAs[Long]("n_pairs")
    // 16 buckets over 500 vectors: far fewer than N^2/2 but nonzero
    assert(n > 100 && n < 500L * 499 / 2 / 4)
    val d2 = r.getAs[Double]("mean_sq_dist")
    assert(d2 >= 0.0 && d2 <= 4.0)
    val u = r.getAs[Double]("uniformity")
    // ln E[exp(-2 d^2)] in [-8, 0]
    assert(u <= 0.0 && u >= -8.0)
    // Jensen: ln E[exp(-2 d^2)] >= -2 E[d^2] (up to trunc4 cuts)
    assert(u >= -2.0 * d2 - 1e-3)
  }

  test("chp_funnel_time_pctl: ordered percentiles, nonnegative deltas") {
    val out = SparkEntry.queries("chp_funnel_time_pctl")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_converted") > 0)
    val p50 = r.getAs[Double]("p50_s")
    val p90 = r.getAs[Double]("p90_s")
    val mx = r.getAs[Double]("max_s")
    assert(p50 >= 0.0 && p50 <= p90 && p90 <= mx)
  }

  test("agg_theil_index: decomposition adds up, shares sum to 1") {
    val out = SparkEntry.queries("agg_theil_index")(spark, sf).collect()
    val (summary, groups) = out.partition(_.getAs[String]("grp").startsWith("_"))
    assert(summary.length === 3 && groups.nonEmpty)
    def s(name: String) =
      summary.find(_.getAs[String]("grp") == name).get.getAs[Double]("theil")
    val within = s("_WITHIN"); val between = s("_BETWEEN"); val total = s("_TOTAL")
    // Theil components are nonnegative and total = within + between
    assert(within >= 0.0 && between >= 0.0)
    assert(math.abs(total - within - between) < 2e-4)
    // income shares of the groups sum to ~1
    val shares = groups.map(_.getAs[Double]("income_share")).sum
    assert(math.abs(shares - 1.0) < 1e-3)
    // within is a share-weighted mean of the group theils: bounded by max
    val maxG = groups.map(_.getAs[Double]("theil")).max
    assert(within <= maxG + 1e-9)
    // per-group theils are nonnegative (Jensen)
    groups.foreach(g => assert(g.getAs[Double]("theil") >= 0.0))
  }
}
