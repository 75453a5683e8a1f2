package graft

/** Round-9 wave-56 gates (SURVEY §2.28). */
class Round9beSpec extends SparkSpec {

  test("ds_flatmap_sessions: typed spelling equals the window sessionizer") {
    val typed = SparkEntry.queries("ds_flatmap_sessions")(spark, sf)
      .collect().map(_.toString).sorted
    val windowed = SparkEntry.queries("chp_sessionize_batch")(spark, sf)
      .collect().map(_.toString).sorted
    // the one-to-many flatMapGroups output is row-identical to the
    // gaps-and-islands window twin
    assert(typed.toSeq === windowed.toSeq)
    assert(typed.nonEmpty)
  }

  test("ts_forecast_reconcile: reconciled parts sum to the top-down total") {
    val out = SparkEntry.queries("ts_forecast_reconcile")(spark, sf).collect()
    assert(out.length === 5)
    val td = out.head.getAs[Double]("top_down_total")
    val bu = out.head.getAs[Double]("bottom_up_total")
    assert(td > 0 && bu > 0)
    out.foreach { r =>
      assert(r.getAs[Double]("top_down_total") === td)
      assert(r.getAs[Double]("bottom_up_total") === bu)
      assert(r.getAs[Double]("share") > 0.0 && r.getAs[Double]("share") < 1.0)
    }
    val shares = out.map(_.getAs[Double]("share")).sum
    assert(math.abs(shares - 1.0) < 1e-3)
    val recon = out.map(_.getAs[Double]("reconciled")).sum
    // proportional top-down: the reconciled parts rebuild the total
    assert(math.abs(recon - td) < td * 1e-3 + 1e-2)
  }

  test("text_hash_collision_audit: collisions vanish as the space grows") {
    val out = SparkEntry.queries("text_hash_collision_audit")(spark, sf)
      .collect()
    assert(out.length === 3)
    val byK = out.sortBy(_.getAs[Long]("bits"))
    assert(byK.map(_.getAs[Long]("bits")).toSeq === Seq(10L, 14L, 18L))
    val nTerms = byK.head.getAs[Long]("n_terms")
    assert(nTerms > 0 && byK.forall(_.getAs[Long]("n_terms") === nTerms))
    byK.foreach { r =>
      assert(r.getAs[Long]("space") === (1L << r.getAs[Long]("bits").toInt))
      assert(r.getAs[Long]("n_buckets_used") <=
        math.min(nTerms, r.getAs[Long]("space")))
      assert(r.getAs[Long]("n_collided") ===
        nTerms - r.getAs[Long]("n_buckets_used"))
    }
    // a bigger table can only reduce (never increase) collisions
    val coll = byK.map(_.getAs[Long]("n_collided"))
    assert(coll.toSeq === coll.sortBy(-_).toSeq)
    // load factor falls 16x per step
    val lf = byK.map(_.getAs[Double]("load_factor"))
    assert(lf(0) > lf(1) && lf(1) > lf(2))
  }
}
