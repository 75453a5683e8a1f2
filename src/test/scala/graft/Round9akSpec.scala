package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-36 gates (SURVEY §2.28). */
class Round9akSpec extends SparkSpec {

  test("maint_skip_effectiveness: z layout prunes strictly harder") {
    val out = SparkEntry.queries("maint_skip_effectiveness")(spark, sf)
      .collect()
    assert(out.length === 5)
    out.foreach { r =>
      // the z layout must prune strictly harder than round-robin ingest
      // (at tiny sf a sparse round-robin file can miss a probe by luck,
      // so skip_nat is bounded, not exactly 0)
      assert(r.getAs[Long]("files_z") < r.getAs[Long]("files_nat"))
      assert(r.getAs[Double]("skip_z") > r.getAs[Double]("skip_nat"))
      assert(r.getAs[Double]("skip_z") > 0.5)
    }
  }

  test("chp_feature_cross_ctr: cells partition events, buckets in range") {
    val out = SparkEntry.queries("chp_feature_cross_ctr")(spark, sf)
      .collect()
    val total = sources.Tables.t(spark, sf, "events").count()
    assert(out.map(_.getAs[Long]("n")).sum === total)
    out.foreach { r =>
      assert(r.getAs[Long]("hod") >= 0 && r.getAs[Long]("hod") <= 23)
      assert(r.getAs[Long]("dow") >= 1 && r.getAs[Long]("dow") <= 7)
      assert(r.getAs[Long]("bucket") >= 0 && r.getAs[Long]("bucket") < 64)
      val cvr = r.getAs[Double]("cvr")
      assert(cvr >= 0.0 && cvr <= 1.0)
    }
  }

  test("sql_inline_values: weights apply exactly") {
    val out = SparkEntry.queries("sql_inline_values")(spark, sf).collect()
    assert(out.length === 5)
    val wts = Map("view" -> 1L, "click" -> 3L, "signup" -> 10L,
      "purchase" -> 25L, "error" -> 0L)
    out.foreach { r =>
      val et = r.getAs[String]("event_type")
      assert(r.getAs[Long]("wt") === wts(et))
      assert(r.getAs[Long]("weighted_n") === r.getAs[Long]("n") * wts(et))
    }
  }
}
