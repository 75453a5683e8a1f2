package graft

/** Round-9 wave-64 gates (SURVEY §2.28). */
class Round9bmSpec extends SparkSpec {

  test("text_textrank_sentences: one top sentence per linked document") {
    val out = SparkEntry.queries("text_textrank_sentences")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    val docs = out.map(_.getAs[Long]("doc_id")).toSeq
    assert(docs === docs.distinct)
    out.foreach { r =>
      assert(r.getAs[Long]("n_sents_linked") >= 1)
      val sent = r.getAs[Long]("top_sent")
      assert(sent >= 0 && sent < 1000)
      // rank mass is positive and bounded (pr sums to ~1 corpus-wide)
      val pr = r.getAs[Double]("top_pr_x1e4")
      assert(pr > 0.0 && pr < 1e4)
    }
    // most documents have at least one linked sentence pair
    assert(out.length > 400)
  }

  test("ts_runs_test: runs bounded, verdict consistent") {
    val out = SparkEntry.queries("ts_runs_test")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      val n = r.getAs[Long]("n")
      val up = r.getAs[Long]("n_up"); val down = r.getAs[Long]("n_down")
      assert(up + down === n)
      val runs = r.getAs[Long]("runs")
      assert(runs >= 1 && runs <= n)
      val z = r.getAs[Double]("z_score")
      assert(r.getAs[Int]("nonrandom") ===
        (if (math.abs(z) > 1.96) 1 else 0))
    }
  }

  test("agg_tukey_fences: quartiles ordered, outliers a small tail") {
    val out = SparkEntry.queries("agg_tukey_fences")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      val q1 = r.getAs[Double]("q1"); val q3 = r.getAs[Double]("q3")
      assert(q1 <= q3)
      val n = r.getAs[Long]("n")
      val outliers = r.getAs[Long]("n_low_outliers") +
        r.getAs[Long]("n_high_outliers")
      assert(outliers >= 0 && outliers < n / 4)
      val share = r.getAs[Double]("outlier_share")
      assert(math.abs(share - math.floor(outliers.toDouble / n * 1e4) / 1e4)
        < 1e-9)
    }
  }
}
