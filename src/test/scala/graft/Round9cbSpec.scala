package graft

import graft.operators.QRound9cb

/** Round-9 wave-79 gates (SURVEY §2.28). */
class Round9cbSpec extends SparkSpec {

  test("ucbReplay: pulls cover horizon, clear best arm dominates") {
    // arm 2 pays 10, others pay 1 -> after forced exploration the
    // policy should exploit arm 2 almost exclusively
    val rewards = Seq.fill(50)(Seq(1L, 1L, 10L, 1L))
    val (n, s) = QRound9cb.ucbReplay(rewards)
    assert(n.sum === 50L)
    assert(s.sum === n.zipWithIndex.map { case (c, a) =>
      c * (if (a == 2) 10L else 1L) }.sum)
    assert(n(2) > 35) // exploitation dominates
  }

  test("chp_bandit_ucb_replay: pulls sum to horizon, shared regret") {
    val out = SparkEntry.queries("chp_bandit_ucb_replay")(spark, sf)
      .collect()
    assert(out.map(_.getAs[String]("arm")).toSeq ===
      Seq("click", "error", "signup", "view"))
    val pulls = out.map(_.getAs[Long]("n_pulls")).sum
    assert(pulls >= 20) // one pull per day over the horizon
    out.foreach { r =>
      assert(r.getAs[Long]("n_pulls") >= 1) // forced exploration
      assert(r.getAs[Long]("reward") >= 0)
    }
    val regrets = out.map(_.getAs[Long]("regret")).distinct
    assert(regrets.length === 1 && regrets.head >= 0)
  }

  test("profile_join_fanout: exact totals, skew >= 1") {
    val out = SparkEntry.queries("profile_join_fanout")(spark, sf)
      .collect()
    assert(out.length === 4)
    out.foreach { r =>
      assert(r.getAs[Long]("n_keys") > 0)
      assert(r.getAs[Long]("n_rows") >= r.getAs[Long]("n_keys"))
      assert(r.getAs[Long]("max_per_key") >= 1)
      assert(r.getAs[Double]("avg_fanout") >= 1.0 - 1e-4)
      assert(r.getAs[Double]("skew_ratio") >= 1.0 - 1e-4)
    }
    val li = graft.sources.Tables.t(spark, sf, "lineitem").count()
    out.filter(_.getAs[String]("edge").endsWith("lineitem"))
      .foreach(r => assert(r.getAs[Long]("n_rows") === li))
  }

  test("agg_hodges_lehmann: pseudo-median near the plain median") {
    val out = SparkEntry.queries("agg_hodges_lehmann")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      val n = r.getAs[Long]("n_days")
      assert(r.getAs[Long]("n_pairs") === n * (n - 1) / 2 + n)
      val hl = r.getAs[Double]("hodges_lehmann")
      val med = r.getAs[Double]("plain_median")
      // for roughly symmetric count data the two agree loosely
      assert(math.abs(hl - med) < math.max(5.0, med * 0.5))
    }
  }
}
