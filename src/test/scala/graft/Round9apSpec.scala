package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-41 gates (SURVEY §2.28). */
class Round9apSpec extends SparkSpec {

  test("chp_bounce_rate: rates bounded, sessions reconcile") {
    val out = SparkEntry.queries("chp_bounce_rate")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val rate = r.getAs[Double]("bounce_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("n_bounce") <= r.getAs[Long]("n_sessions"))
    }
    // session total matches the declared sessionizer's count
    val sess = SparkEntry.queries("chp_sessionize_batch")(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_sessions")).sum === sess)
  }

  test("ts_anomaly_stl: every alert is a genuine residual outlier") {
    val out = SparkEntry.queries("ts_anomaly_stl")(spark, sf).collect()
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("z")) > 2.5)
      // context columns reassemble (same gate as the STL spec)
      val recon = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("resid")
      assert(math.abs(recon - r.getAs[Double]("x")) < 3e-4)
    }
  }

  test("mm_image_quadrant_stats: planted half-split image separates") {
    import spark.implicits._
    // 4x4: top half red(200,0,0), bottom half blue(0,0,200)
    val px = (Array.fill(8)(Array(200, 0, 0)) ++
      Array.fill(8)(Array(0, 0, 200))).flatten.map(_.toByte)
    val header = "P6\n4 4\n255\n".getBytes("US-ASCII")
    val media = Seq(operators.Multimodal.MediaRow(1L, header ++ px, "ppm"))
      .toDS()
    val out = operators.QRound9ap.quadrantStats(media).collect()
    assert(out.length === 4)
    val byQ = out.map(r => r.getAs[Long]("quadrant") -> r).toMap
    assert(byQ(0L).getAs[Double]("r_mean") === 200.0) // TL red
    assert(byQ(1L).getAs[Double]("r_mean") === 200.0) // TR red
    assert(byQ(2L).getAs[Double]("b_mean") === 200.0) // BL blue
    assert(byQ(3L).getAs[Double]("b_mean") === 200.0) // BR blue
    assert(byQ(0L).getAs[Long]("n_px") === 4L)
  }
}
