package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-37 gates (SURVEY §2.28). */
class Round9alSpec extends SparkSpec {

  test("ts_stl_decompose: components reassemble the series exactly") {
    val out = SparkEntry.queries("ts_stl_decompose")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      // x = trend + seasonal + resid within two trunc4 steps
      val recon = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("resid")
      assert(math.abs(recon - r.getAs[Double]("x")) < 3e-4)
    }
    // seasonal is a pure hour-of-day function per series
    val byKey = out.groupBy(r => (r.getAs[String]("event_type"),
      r.getAs[Any]("hr").toString.substring(11, 13)))
    byKey.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Double]("seasonal")).distinct.length === 1)
    }
  }

  test("profile_hist2d: cells partition the table, mass positive") {
    val out = SparkEntry.queries("profile_hist2d")(spark, sf).collect()
    val total = sources.Tables.t(spark, sf, "lineitem").count()
    assert(out.map(_.getAs[Long]("n")).sum === total)
    out.foreach { r =>
      assert(r.getAs[Long]("qbin") >= 0 && r.getAs[Long]("qbin") <= 5)
      assert(r.getAs[Long]("pbin") >= 0 && r.getAs[Long]("pbin") <= 10)
      assert(r.getAs[Double]("mass") > 0.0)
    }
  }

  test("serve_feature_snapshot: features replay driver-side") {
    val out = SparkEntry.queries("serve_feature_snapshot")(spark, sf)
      .collect()
    assert(out.map(_.getAs[Long]("user_id")).sorted === Seq(3L, 7L, 11L))
    val ev = sources.Tables.t(spark, sf, "events")
      .filter(col("user_id").isin(3L, 7L, 11L)).collect()
    val byUser = ev.groupBy(_.getAs[Long]("user_id"))
    out.foreach { r =>
      val rows = byUser(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n_events") === rows.length.toLong)
      assert(r.getAs[Long]("n_purchase") ===
        rows.count(_.getAs[String]("event_type") == "purchase").toLong)
      val last = rows.maxBy(x =>
        (x.getAs[java.time.LocalDateTime]("ts").toString,
          x.getAs[Long]("event_id")))
      assert(r.getAs[String]("last_action") ===
        last.getAs[String]("event_type"))
      assert(Seq("whale", "regular", "casual")
        .contains(r.getAs[String]("segment")))
    }
  }
}
