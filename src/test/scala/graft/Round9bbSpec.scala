package graft

/** Round-9 wave-53 gates (SURVEY §2.28). */
class Round9bbSpec extends SparkSpec {

  test("dedup_lsh_tuning: candidates grow with band count") {
    val out = SparkEntry.queries("dedup_lsh_tuning")(spark, sf).collect()
    assert(out.length === 4)
    val byB = out.sortBy(_.getAs[Long]("bands"))
    assert(byB.map(_.getAs[Long]("bands")).toSeq === Seq(4L, 8L, 16L, 32L))
    byB.foreach { r =>
      assert(r.getAs[Long]("bands") * r.getAs[Long]("rows_per_band") === 32L)
      val thr = r.getAs[Double]("est_threshold")
      assert(thr > 0.0 && thr < 1.0)
    }
    // more bands of fewer rows => looser filter => monotone more candidates
    val cands = byB.map(_.getAs[Long]("n_candidates"))
    assert(cands.toSeq === cands.sorted.toSeq)
    // the S-curve threshold drops as bands grow
    val thrs = byB.map(_.getAs[Double]("est_threshold"))
    assert(thrs.toSeq === thrs.sorted.reverse.toSeq)
  }

  test("pipeline_run_manifest: stages only shrink, fingerprints persist") {
    val out = SparkEntry.queries("pipeline_run_manifest")(spark, sf).collect()
    assert(out.length === 3)
    val byS = out.sortBy(_.getAs[Long]("stage_no"))
    assert(byS.map(_.getAs[String]("stage")).toSeq ===
      Seq("1_raw", "2_clean", "3_dedup"))
    val ns = byS.map(_.getAs[Long]("n_rows"))
    // filter and dedup can only remove rows
    assert(ns(0) >= ns(1) && ns(1) >= ns(2) && ns(2) > 0)
    byS.foreach(r => assert(r.getAs[Long]("content_fp") > 0))
    // re-running the manifest reproduces it bit for bit
    val again = SparkEntry.queries("pipeline_run_manifest")(spark, sf).collect()
    assert(again.map(_.toString).sorted.toSeq ===
      out.map(_.toString).sorted.toSeq)
  }

  test("chp_qini_curve: cumulative sizes monotone, null uplift near zero") {
    val out = SparkEntry.queries("chp_qini_curve")(spark, sf).collect()
    assert(out.nonEmpty)
    val desc = out.sortBy(-_.getAs[Long]("bucket"))
    // walking down the score, cumulative arm sizes only grow
    val nt = desc.map(_.getAs[Long]("cum_n_t"))
    val nc = desc.map(_.getAs[Long]("cum_n_c"))
    assert(nt.toSeq === nt.sorted.toSeq)
    assert(nc.toSeq === nc.sorted.toSeq)
    // null experiment: the final qini point is small relative to the arms
    val last = desc.last
    val scale = math.max(1.0, last.getAs[Long]("cum_n_t").toDouble * 0.25)
    assert(math.abs(last.getAs[Double]("qini")) < scale)
  }
}
