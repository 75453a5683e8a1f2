package graft

/** Round-9 wave-85 gates (SURVEY §2.28). */
class Round9chSpec extends SparkSpec {

  test("mm_image_hog_lite: buckets partition the pixel plane") {
    val out = SparkEntry.queries("mm_image_hog_lite")(spark, sf).collect()
    assert(out.length === 500)
    out.foreach { r =>
      val w = r.getAs[Int]("w"); val h = r.getAs[Int]("h")
      assert(w >= 4 && w <= 8 && h >= 3 && h <= 6)
      val n = 3L * w * h
      val tot = r.getAs[Long]("b0") + r.getAs[Long]("b1") +
        r.getAs[Long]("b2") + r.getAs[Long]("b3")
      assert(tot === n) // every pixel lands in exactly one bucket
    }
  }

  test("text_top_p_nucleus: covers 90%, dropping the tail breaks it") {
    val out = SparkEntry.queries("text_top_p_nucleus")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Int]("rnk")).toSeq === (1 to out.length))
    val cnts = out.map(_.getAs[Long]("cnt")).toSeq
    assert(cnts === cnts.sortBy(-_)) // descending mass
    val probs = out.map(_.getAs[Double]("renorm_prob"))
    // renormalized nucleus probabilities sum to ~1
    assert(math.abs(probs.sum - 1.0) < 1e-2)
  }

  test("chp_markov_reward_ltv: LTV dominates one-step reward") {
    val out = SparkEntry.queries("chp_markov_reward_ltv")(spark, sf)
      .collect()
    assert(out.length === 5)
    out.foreach { r =>
      val rew = r.getAs[Double]("reward_per_event")
      val ltv = r.getAs[Double]("discounted_ltv")
      assert(rew >= 0.0)
      // v includes the immediate reward plus a nonnegative future term
      assert(ltv >= rew - 1e-9)
      // gamma = 1/2 bounds the series by r_max * 2
      assert(ltv <= 2.0 * out.map(_.getAs[Double]("reward_per_event")).max
        + 1.0)
    }
  }
}
