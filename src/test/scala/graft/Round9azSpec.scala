package graft

/** Round-9 wave-51 gates (SURVEY §2.28). */
class Round9azSpec extends SparkSpec {

  test("ts_sax_symbolize: 8-letter words over the {a,b,c,d} alphabet") {
    val out = SparkEntry.queries("ts_sax_symbolize")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      val word = r.getAs[String]("sax_word")
      assert(word.length === r.getAs[Long]("n_segments"))
      assert(r.getAs[Long]("n_segments") === 8L)
      assert(word.forall(c => c >= 'a' && c <= 'd'))
      val distinct = word.distinct.length
      assert(r.getAs[Long]("n_symbols") === distinct.toLong)
      // a z-scored series cannot sit entirely in one symbol bucket
      assert(distinct >= 2)
    }
  }

  test("chp_churn_windows: rate monotone decreasing in the horizon") {
    val out = SparkEntry.queries("chp_churn_windows")(spark, sf).collect()
    assert(out.length === 3)
    val byH = out.sortBy(_.getAs[Long]("horizon_days"))
    assert(byH.map(_.getAs[Long]("horizon_days")).toSeq === Seq(7L, 14L, 21L))
    val n = byH.head.getAs[Long]("n_users")
    assert(n > 0 && byH.forall(_.getAs[Long]("n_users") === n))
    // a longer inactivity window can only shrink the churned set
    val churned = byH.map(_.getAs[Long]("n_churned"))
    assert(churned.toSeq === churned.sortBy(-_).toSeq)
    byH.foreach { r =>
      val rate = r.getAs[Double]("churn_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("profile_contract_check: the synthetic corpus passes its contract") {
    val out = SparkEntry.queries("profile_contract_check")(spark, sf).collect()
    assert(out.length === 5)
    val n = out.head.getAs[Long]("n_rows")
    assert(n > 0 && out.forall(_.getAs[Long]("n_rows") === n))
    out.foreach { r =>
      val v = r.getAs[Long]("n_violations")
      assert(v >= 0 && v <= n)
      assert(r.getAs[Int]("pass") === (if (v == 0) 1 else 0))
    }
    // the driver-generated corpus is contract-clean: all rules pass
    assert(out.forall(_.getAs[Int]("pass") === 1))
  }
}
