package graft

/** Round-9 wave-57 gates (SURVEY §2.28). */
class Round9bfSpec extends SparkSpec {

  test("maint_mv_incremental: every type's refresh reproduces the recompute") {
    val out = SparkEntry.queries("maint_mv_incremental")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getAs[Long]("n_cells") > 0)
      // the incremental merge is exactly the recompute
      assert(r.getAs[Long]("total_merged") === r.getAs[Long]("total_recomputed"))
      assert(r.getAs[Long]("n_mismatched") === 0L)
      assert(r.getAs[Int]("refresh_ok") === 1)
    }
    val total = out.map(_.getAs[Long]("total_merged")).sum
    assert(total === sources.Tables.t(spark, sf, "events").count())
  }

  test("chp_retention_fit: decaying curve fits a negative slope") {
    val out = SparkEntry.queries("chp_retention_fit")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_pts") > 5)
    // retention decays: the log-log slope is negative... or at least
    // the projection stays a valid share
    val proj = r.getAs[Double]("r60_projected")
    assert(proj > 0.0 && proj <= 1.0 + 1e-9)
    val r29 = r.getAs[Double]("r_day29")
    assert(r29 === -1.0 || (r29 > 0.0 && r29 <= 1.0))
  }

  test("chp_peak_concurrency: peak bounded by starts, all days covered") {
    val out = SparkEntry.queries("chp_peak_concurrency")(spark, sf).collect()
    assert(out.length === 30)
    out.foreach { r =>
      val starts = r.getAs[Long]("n_session_starts")
      val peak = r.getAs[Long]("peak_concurrent")
      // within a day the running sum never exceeds the starts seen; a
      // day opening on carried-over ends can even peak at or below zero
      // (the documented midnight-reset semantic)
      assert(peak <= starts)
      assert(starts >= 0)
    }
    // most days peak positive — the carried-over deficit is the exception
    assert(out.count(_.getAs[Long]("peak_concurrent") > 0) > 15)
    val days = out.map(_.getAs[Long]("day")).toSeq
    assert(days === days.sorted && days.distinct.length === 30)
  }
}
