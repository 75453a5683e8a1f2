package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-6 gates (SURVEY §2.27). */
class Round9gSpec extends SparkSpec {

  test("scan_binary_files: whole-file read recovers exact byte lengths") {
    val out = SparkEntry.queries("scan_binary_files")(spark, sf).collect()
    assert(out.length === 100)
    out.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val expected = operators.Multimodal.synthPpm(id).length.toLong
      assert(r.getAs[Long]("n_bytes") === expected,
        s"file $id length ${r.getAs[Long]("n_bytes")} != payload $expected")
      val b = r.getAs[Double]("brightness")
      assert(b >= 0.0 && b <= 1.0)
    }
  }

  test("agg_cms_estimate: CMS never underestimates, exact counts conserve") {
    val out = SparkEntry.queries("agg_cms_estimate")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact"),
        s"${r.getAs[String]("event_type")}: CMS underestimated")
      assert(r.getAs[Long]("overestimate") ===
        r.getAs[Long]("cms_est") - r.getAs[Long]("exact"))
    }
    val total = graft.sources.Tables.t(spark, sf, "events").count()
    assert(out.map(_.getAs[Long]("exact")).sum === total)
  }

  test("ts_hampel_outliers: planted spike flagged, flat days and edges not") {
    import spark.implicits._
    // flat 10s with one 100 spike at day 7 of 0..14
    val daily = (0L to 14L).map(dn =>
      ("a", dn, if (dn == 7) 100L else 10L))
      .toDF("event_type", "day_num", "cnt")
    val out = operators.QRound9g.hampelOutliers(daily).collect()
      .map(r => r.getAs[Long]("day_num") ->
        (r.getAs[Long]("med7"), r.getAs[Boolean]("flag"))).toMap
    assert(out(7L) === ((10L, true)), "spike day must flag against med 10")
    (3L to 11L).filter(_ != 7L).foreach(d =>
      assert(out(d) === ((10L, false)), s"flat day $d wrongly flagged"))
    (0L to 2L).foreach(d =>
      assert(out(d) === ((-1L, false)), s"edge day $d must be unjudged"))
  }
}
