package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-47 gates (SURVEY §2.28). */
class Round9avSpec extends SparkSpec {

  test("sample_pps_systematic: 10 boundary crossings per stratum, PPS shape") {
    val out = SparkEntry.queries("sample_pps_systematic")(spark, sf).collect()
    out.groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      // the n skip boundaries are each crossed exactly once in total
      assert(rows.map(_.getAs[Long]("n_hits")).sum === 10L)
      // pick indices are distinct ends of the crossing spans, in order
      val ks = rows.sortBy(_.getAs[Long]("doc_id")).map(_.getAs[Long]("pick_k"))
      assert(ks.toSeq === ks.sorted.toSeq && ks.toSeq === ks.distinct.toSeq)
      assert(ks.forall(k => k >= 1 && k <= 10))
      rows.foreach(r => assert(r.getAs[Long]("w") > 0))
    }
  }

  test("agg_hist_quantile: estimate within one bin width of exact") {
    val out = SparkEntry.queries("agg_hist_quantile")(spark, sf).collect()
    assert(out.length === 6) // 3 flags x 2 quantiles
    val exact = sources.Tables.t(spark, sf, "lineitem")
      .groupBy(col("l_returnflag").as("flag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("q50"),
        expr("percentile(l_extendedprice, 0.9)").as("q90"),
        min("l_extendedprice").as("mn"), max("l_extendedprice").as("mx"))
      .collect().map(r => r.getAs[String]("flag") ->
        (r.getAs[Double]("q50"), r.getAs[Double]("q90"),
          (r.getAs[Double]("mx") - r.getAs[Double]("mn")) / 1024.0)).toMap
    out.foreach { r =>
      val (q50, q90, binW) = exact(r.getAs[String]("flag"))
      val target = if (r.getAs[Double]("q") == 0.5) q50 else q90
      // the histogram estimate is within one bin width of the sorted truth
      assert(math.abs(r.getAs[Double]("est") - target) <= binW + 1e-6)
    }
  }

  test("graph_powerlaw_fit: alpha above 1, degree bounds sane") {
    val out = SparkEntry.queries("graph_powerlaw_fit")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_nodes") > 0)
    val mn = r.getAs[Long]("min_deg"); val mx = r.getAs[Long]("max_deg")
    assert(mn >= 1 && mx >= mn)
    // continuous MLE with kmin=1 is always > 1
    assert(r.getAs[Double]("alpha") > 1.0)
  }
}
