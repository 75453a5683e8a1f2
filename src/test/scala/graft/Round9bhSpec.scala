package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-59 gates (SURVEY §2.28). */
class Round9bhSpec extends SparkSpec {

  test("scan_nested_prune: the scan reads only the touched struct leaves") {
    val df = operators.QRound9bh.nestedFrame(spark, sf)
      .groupBy((col("meta.k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    // pruning reaches inside the struct: the touched leaf is read...
    assert(readSchema.contains("k"), s"no leaf read:\n$readSchema")
    // ...and the untouched sibling field is NOT
    assert(!readSchema.contains("etype"),
      s"sibling struct field not pruned:\n$readSchema")
    assert(df.collect().map(_.getAs[Long]("n")).sum ===
      sources.Tables.t(spark, sf, "events").count())
  }

  test("graph_attr_assortativity: coefficient bounded, shares coherent") {
    val out = SparkEntry.queries("graph_attr_assortativity")(spark, sf)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_directed_edges") > 0)
    val same = r.getAs[Double]("same_lang_share")
    val exp = r.getAs[Double]("expected_share")
    assert(same >= 0.0 && same <= 1.0)
    assert(exp > 0.0 && exp < 1.0)
    val a = r.getAs[Double]("assortativity")
    // Newman's r is bounded by [-1, 1]
    assert(a >= -1.0 && a <= 1.0)
    // sign coherence with the share comparison (up to trunc4 cuts)
    if (same > exp + 2e-4) assert(a > -1e-4)
    if (same < exp - 2e-4) assert(a < 1e-4)
  }

  test("agg_hdi_interval: narrowest window beats the naive quantile band") {
    val out = SparkEntry.queries("agg_hdi_interval")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      val n = r.getAs[Long]("n_values"); val k = r.getAs[Long]("k_points")
      assert(k === math.ceil(n * 0.9).toLong)
      val lo = r.getAs[Double]("hdi_lo"); val hi = r.getAs[Double]("hdi_hi")
      assert(lo <= hi)
      assert(math.abs(r.getAs[Double]("width") - (hi - lo)) < 2e-4)
      // the HDI can never be wider than the full range
      assert(r.getAs[Double]("width") >= 0.0)
    }
  }
}
