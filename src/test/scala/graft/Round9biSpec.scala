package graft

/** Round-9 wave-60 gates (SURVEY §2.28). */
class Round9biSpec extends SparkSpec {

  test("agg_welch_ttest: null split does not reject, df within bounds") {
    val out = SparkEntry.queries("agg_welch_ttest")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    val na = r.getAs[Long]("n_a"); val nb = r.getAs[Long]("n_b")
    assert(na > 1 && nb > 1)
    val df = r.getAs[Double]("df")
    // Welch-Satterthwaite df lies between min(n)-1 and n_a+n_b-2
    assert(df >= math.min(na, nb) - 1 - 1e-3)
    assert(df <= na + nb - 2 + 1e-3)
    // the md5 split is a null experiment: no significant difference
    assert(r.getAs[Int]("significant") === 0)
    assert(math.abs(r.getAs[Double]("t_stat")) < 1.96)
  }

  test("mm_image_mirror_symmetry: score bounded, asymmetry exact") {
    val out = SparkEntry.queries("mm_image_mirror_symmetry")(spark, sf)
      .collect()
    assert(out.length === 500)
    out.foreach { r =>
      val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
      val asym = r.getAs[Long]("asym")
      assert(asym >= 0 && asym <= 3L * (w / 2) * h * 255)
      val sym = r.getAs[Double]("symmetry")
      assert(sym >= 0.0 && sym <= 1.0)
    }
    // the synthetic gradient pattern is never perfectly mirrored
    assert(out.forall(_.getAs[Double]("symmetry") < 1.0))
  }

  test("sql_lateral_alias: the alias chain resolves consistently") {
    val out = SparkEntry.queries("sql_lateral_alias")(spark, sf).collect()
    assert(out.length === 3)
    out.foreach { r =>
      val n = r.getAs[Long]("n")
      val pf = r.getAs[Long]("pct_floor")
      // pct_floor really is floor(n * 100 / 60000)
      assert(pf === math.floor(n * 100.0 / 60000).toLong)
      val band = r.getAs[String]("band")
      assert(band === (if (pf >= 40) "major" else "minor"))
    }
  }
}
