package graft

/** Round-9 wave-58 gates (SURVEY §2.28). */
class Round9bgSpec extends SparkSpec {

  test("sim_rocchio_expand: overlap bounded, feedback keeps relevance") {
    val out = SparkEntry.queries("sim_rocchio_expand")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      val ov = r.getAs[Long]("n_overlap")
      assert(ov >= 0 && ov <= 5)
      assert(r.getAs[Long]("init_top1") != r.getAs[Long]("qid"))
      assert(r.getAs[Long]("new_top1") != r.getAs[Long]("qid"))
    }
    // moving toward the neighborhood centroid cannot discard ALL
    // original neighbors for every query
    assert(out.map(_.getAs[Long]("n_overlap")).sum > 0)
  }

  test("chp_sessionize_incremental: the handoff identity holds exactly") {
    val out = SparkEntry.queries("chp_sessionize_incremental")(spark, sf)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_users") > 0)
    assert(r.getAs[Long]("n_sessions_full") ===
      r.getAs[Long]("n_sessions_incremental"))
    assert(r.getAs[Long]("n_mismatch") === 0L)
    assert(r.getAs[Long]("n_boundary_merged") >= 0)
  }

  test("text_stylometry_confusion: cells partition the corpus") {
    val out = SparkEntry.queries("text_stylometry_confusion")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    val total = out.map(_.getAs[Long]("n")).sum
    assert(total === sources.Tables.t(spark, sf, "documents").count())
    // every source's row mass is its document count (25 per source)
    out.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("n")).sum === 25L)
    }
  }
}
