package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-38 gates (SURVEY §2.28). */
class Round9amSpec extends SparkSpec {

  test("text_minhash_estimate: estimator bounded, error consistent") {
    val out = SparkEntry.queries("text_minhash_estimate")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val est = r.getAs[Double]("est")
      val jac = r.getAs[Double]("jac")
      assert(est >= 0.0 && est <= 1.0)
      assert(jac >= 0.0 && jac <= 1.0)
      // granularity: est is a multiple of 1/16 (trunc4'd)
      val grid = math.floor(math.round(est * 16) / 16.0 * 1e4) / 1e4
      assert(math.abs(est - grid) < 2e-4)
      assert(r.getAs[Double]("abs_err") ===
        math.floor(math.abs(est - jac) * 1e4) / 1e4)
    }
    // LSH candidates are high-jaccard by construction: the estimator
    // must correlate — mean error well below a coin flip
    val meanErr = out.map(_.getAs[Double]("abs_err")).sum / out.length
    assert(meanErr < 0.3)
  }

  test("graph_component_sizes: histogram accounts for every doc") {
    val out = SparkEntry.queries("graph_component_sizes")(spark, sf)
      .collect()
    val total = sources.Tables.t(spark, sf, "documents").count()
    val mass = out.map(r => r.getAs[Long]("size") * r.getAs[Long]("n_comp"))
      .sum
    assert(mass === total)
    val shares = out.map(_.getAs[Double]("node_share")).sum
    assert(math.abs(shares - 1.0) < 1e-2)
  }

  test("ts_gap_percentiles: monotone percentiles, max dominates") {
    val out = SparkEntry.queries("ts_gap_percentiles")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      val (p50, p90, p99, mx) = (r.getAs[Double]("p50_s"),
        r.getAs[Double]("p90_s"), r.getAs[Double]("p99_s"),
        r.getAs[Double]("max_s"))
      assert(p50 <= p90 && p90 <= p99 && p99 <= mx)
      assert(p50 > 0.0)
      assert(r.getAs[Long]("n_gaps") > 0L)
    }
  }
}
