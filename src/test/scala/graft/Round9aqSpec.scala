package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-42 gates (SURVEY §2.28). */
class Round9aqSpec extends SparkSpec {

  test("serve_prefix_complete: completions really complete their prefix") {
    val out = SparkEntry.queries("serve_prefix_complete")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[String]("token")
        .startsWith(r.getAs[String]("prefix")))
      assert(r.getAs[Long]("rnk") >= 1 && r.getAs[Long]("rnk") <= 3)
      assert(r.getAs[Long]("freq") > 0)
    }
    // per prefix: freq non-increasing with rank
    out.groupBy(_.getAs[String]("prefix")).foreach { case (_, rows) =>
      val byRnk = rows.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Long]("freq"))
      assert(byRnk.toSeq === byRnk.sortBy(-_).toSeq)
    }
  }

  test("chp_ab_srm_check: a healthy hash split passes SRM") {
    val out = SparkEntry.queries("chp_ab_srm_check")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    val users = sources.Tables.t(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") === users)
    assert(r.getAs[Double]("chi2") >= 0.0)
    // md5 is a fair coin: the split must not trip the 0.05 gate
    assert(r.getAs[Int]("srm_flag") === 0)
  }

  test("chp_did_estimate: DiD is the plain cell arithmetic; null effect") {
    val out = SparkEntry.queries("chp_did_estimate")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    val did = r.getAs[Double]("did")
    // no intervention exists in the synthetic corpus: the estimate
    // should be small relative to the purchase mean
    assert(math.abs(did) < math.abs(r.getAs[Double]("treat_pre")) * 0.5 + 5.0)
    // and the pre/post means are all positive values
    Seq("treat_pre", "treat_post", "ctrl_pre", "ctrl_post").foreach { c =>
      assert(r.getAs[Double](c) > 0.0)
    }
  }
}
