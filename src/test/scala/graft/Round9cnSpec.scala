package graft

/** Round-9 wave-91 gates (SURVEY §2.28). */
class Round9cnSpec extends SparkSpec {

  test("ts_seasonal_mase: MAEs consistent with the verdict") {
    val out = SparkEntry.queries("ts_seasonal_mase")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getAs[Long]("n_eval") > 5L)
      val m1 = r.getAs[Double]("mae_naive1")
      val m7 = r.getAs[Double]("mae_seasonal")
      assert(m1 >= 0.0 && m7 >= 0.0)
      val better = r.getAs[Int]("seasonal_better")
      if (better == 1) assert(m7 <= m1 + 1e-9)
      assert(r.getAs[Double]("mase") >= 0.0)
    }
  }

  test("agg_median_polish: decomposition reconstructs the table") {
    val out = SparkEntry.queries("agg_median_polish")(spark, sf).collect()
    assert(out.length === 6) // 3 returnflags × 2 linestatuses
    out.foreach { r =>
      val cell = r.getAs[Double]("cell_median")
      val sum = r.getAs[Double]("row_eff") + r.getAs[Double]("col_eff") +
        r.getAs[Double]("residual")
      // additive decomposition: cell = row + col + residual (grand
      // folded into the row effects by the sweep order)
      assert(math.abs(cell - sum) < 1e-9)
    }
  }

  test("sql_order_by_all: fully sorted, groups cover the key space") {
    val out = SparkEntry.queries("sql_order_by_all")(spark, sf).collect()
    assert(out.length === 6)
    val keys = out.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(keys === keys.sorted) // ORDER BY ALL ⇒ lexicographic
    assert(out.map(_.getAs[Long]("n")).sum > 0L)
  }
}
