package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-29 gates (SURVEY §2.28). */
class Round9adSpec extends SparkSpec {

  test("chp_rfm_segments: scores stay in range and conserve users") {
    val out = SparkEntry.queries("chp_rfm_segments")(spark, sf).collect()
    val users = operators.QPipeline.chpFeaturesLabel(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_users")).sum === users,
      "segment rollup lost users")
    out.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v >= 1L && v <= 5L, s"$c out of range: $v")
      }
    }
    // recency score must anti-correlate with mean recency: the best
    // (r=5) cells average fewer inactive days than the worst (r=1)
    val byR = out.groupBy(_.getAs[Long]("r_score")).map { case (k, rows) =>
      k -> rows.map(r =>
        r.getAs[Double]("mean_recency") * r.getAs[Long]("n_users")).sum /
        rows.map(_.getAs[Long]("n_users")).sum
    }
    if (byR.contains(1L) && byR.contains(5L))
      assert(byR(5L) <= byR(1L))
  }

  test("chp_reason_codes: magnitudes re-derive from the frozen weights") {
    val feats = operators.QPipeline.chpFeaturesLabel(spark, sf).collect()
    val n = feats.length.toLong
    def cents(d: Double): Long = math.floor(d * 1e2 + 5e-1).toLong
    val sC = feats.map(_.getAs[Long]("n_clicks")).sum
    val sP = feats.map(_.getAs[Long]("n_purchases")).sum
    val sV = cents(feats.map(_.getAs[Double]("total_value")).sum)
    val sD = feats.map(_.getAs[Long]("days_inactive")).sum
    val out = SparkEntry.queries("chp_reason_codes")(spark, sf).collect()
    assert(out.length.toLong === n)
    val byUser = feats.map(f => f.getAs[Long]("user_id") -> f).toMap
    out.take(50).foreach { r =>
      val f = byUser(r.getAs[Long]("user_id"))
      val devs = Seq(
        ("n_clicks", (f.getAs[Long]("n_clicks") * n - sC).toDouble * 2e-2),
        ("n_purchases", (f.getAs[Long]("n_purchases") * n - sP).toDouble * 1e-1),
        ("total_value",
          (cents(f.getAs[Double]("total_value")) * n - sV).toDouble * 2e-6),
        ("days_inactive",
          (f.getAs[Long]("days_inactive") * n - sD).toDouble * -2e-1))
      val mags = devs.map { case (nm, d) =>
        (nm, math.floor(math.abs(d) * 1e6 / n + 0.5).toLong,
          if (d >= 0) 1L else -1L)
      }
      val best = mags.minBy { case (nm, m, _) => (-m, nm) }
      assert(r.getAs[String]("reason") === best._1)
      assert(r.getAs[Long]("magnitude6") === best._2)
      assert(r.getAs[Long]("direction") === best._3)
    }
  }

  test("profile_freshness_lag: the freshest type lags zero") {
    val out = SparkEntry.queries("profile_freshness_lag")(spark, sf).collect()
    assert(out.length === 5)
    assert(out.map(_.getAs[Long]("lag_hours")).min === 0L)
    out.foreach { r =>
      assert(r.getAs[Long]("lag_hours") >= 0L)
      val stale = if (r.getAs[Long]("lag_hours") > 24) 1L else 0L
      assert(r.getAs[Long]("stale") === stale)
    }
  }

  test("wave-29 keys registered with oracles") {
    Seq("chp_rfm_segments", "chp_reason_codes", "profile_freshness_lag")
      .foreach { k =>
        assert(SparkEntry.queries.contains(k), s"$k not registered")
        assert(SparkEntry.oracleSql.contains(k), s"$k has no oracle")
      }
  }
}
