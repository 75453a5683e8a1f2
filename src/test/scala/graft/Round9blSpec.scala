package graft

/** Round-9 wave-63 gates (SURVEY §2.28). */
class Round9blSpec extends SparkSpec {

  test("sim_margin_stats: margins coherent with the top-k table") {
    val out = SparkEntry.queries("sim_margin_stats")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_queries") === 20L)
    val mean = r.getAs[Double]("mean_margin")
    val min = r.getAs[Double]("min_margin")
    // top-1 beats top-2 by construction; margins are nonnegative
    assert(min >= 0.0)
    assert(mean >= min - 1e-4)
    // margins live on the cosine scale
    assert(mean <= 2.0)
    val amb = r.getAs[Long]("n_ambiguous")
    assert(amb >= 0 && amb <= 20)
  }

  test("mm_av_duration_check: both decoders agree with the synthesis") {
    val out = SparkEntry.queries("mm_av_duration_check")(spark, sf).collect()
    assert(out.length === 500)
    out.foreach { r =>
      val nf = r.getAs[Long]("n_frames")
      val ns = r.getAs[Long]("n_samples")
      assert(nf >= 2 && nf <= 5)
      assert(ns >= 64 && ns < 128)
      assert(r.getAs[Long]("samples_per_frame") === ns / nf)
      // this lake's synthesis always lands in the documented band
      assert(r.getAs[Int]("sync_ok") === 1)
    }
  }

  test("dedup_impact_report: dedup only removes, keeps at least one") {
    val out = SparkEntry.queries("dedup_impact_report")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      val db = r.getAs[Long]("docs_before"); val da = r.getAs[Long]("docs_after")
      assert(da >= 1 && da <= db)
      assert(r.getAs[Long]("toks_after") <= r.getAs[Long]("toks_before"))
      val share = r.getAs[Double]("chars_removed_share")
      assert(share >= 0.0 && share < 1.0)
    }
    val totalAfter = out.map(_.getAs[Long]("docs_after")).sum
    // exact dedup across the corpus keeps one doc per distinct text
    val distinctTexts = sources.Tables.t(spark, sf, "documents")
      .select("text").distinct().count()
    assert(totalAfter === distinctTexts)
  }
}
