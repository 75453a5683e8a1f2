package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-20 gates (SURVEY §2.28). */
class Round9uSpec extends SparkSpec {

  test("sql_identifier_clause: the bound identifier plans like the literal") {
    val bound = SparkEntry.queries("sql_identifier_clause")(spark, sf)
    val boundRows = bound.collect().map(_.toString).sorted
    graft.sources.Tables.t(spark, sf, "events")
      .createOrReplaceTempView("g_events_idc")
    val literal = spark.sql(
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(floor(value * 1e2 + 5e-1) AS BIGINT)) AS BIGINT)
        |    AS cents
        |FROM g_events_idc WHERE value > 10
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
      .collect().map(_.toString).sorted
    assert(boundRows === literal)
    assert(boundRows.nonEmpty)
    // the value parameter still pushes down through the identifier
    val plan = bound.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("Filter"),
      s"no filter in:\n$plan")
  }

  test("text_langid_confusion: matrix conserves docs, zh is never predicted") {
    val drv = SparkEntry.queries("text_langid_confusion")(spark, sf).collect()
    val n = graft.sources.Tables.t(spark, sf, "documents").count()
    assert(drv.map(_.getAs[Long]("n")).sum === n)
    // the detector has no zh profile: zh appears only as a true label
    assert(!drv.exists(_.getAs[String]("pred_lang") == "zh"))
    assert(drv.exists(_.getAs[String]("true_lang") == "zh"))
    // row fractions re-derive from the counts
    drv.groupBy(_.getAs[String]("true_lang")).foreach { case (_, rows) =>
      val tot = rows.map(_.getAs[Long]("n")).sum
      rows.foreach { r =>
        val expect = math.floor(r.getAs[Long]("n").toDouble / tot * 1e4) / 1e4
        assert(r.getAs[Double]("row_frac") === expect)
      }
    }
  }

  test("chp_ipw_ate: the estimate re-derives from segment counts") {
    val r = SparkEntry.queries("chp_ipw_ate")(spark, sf).collect().head
    assert(r.getAs[Long]("n_segments") > 0)
    assert(r.getAs[Long]("n_users") > 0)
    val ate = r.getAs[Double]("ate_ipw")
    assert(ate >= -1.000001 && ate <= 1.000001, s"ATE out of range: $ate")
    // with hash-randomized arms the IPW and naive estimates are close
    assert(math.abs(ate - r.getAs[Double]("ate_naive")) < 0.5)
  }

  test("mm_image_colorfulness: grayscale scores 0, pure red scores high") {
    import spark.implicits._
    def ppm(px: Int => (Int, Int, Int)): Array[Byte] = {
      val (w, h) = (4, 4)
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val plane = new Array[Byte](w * h * 3)
      for (i <- 0 until w * h) {
        val (r, g, b) = px(i)
        plane(i * 3) = r.toByte; plane(i * 3 + 1) = g.toByte
        plane(i * 3 + 2) = b.toByte
      }
      header ++ plane
    }
    val gray = ppm(_ => (100, 100, 100)) // rg = 0, yb = 0 everywhere
    val red = ppm(_ => (255, 0, 0)) // rg = 255, yb' = 255
    val media = Seq(
      operators.Multimodal.MediaRow(1L, gray, "ppm"),
      operators.Multimodal.MediaRow(2L, red, "ppm")).toDS()
    val out = operators.QRound9u.colorfulness(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Double]("colorfulness"))
      .toMap
    assert(out(1L) === 0.0)
    // constant red: sigma = 0, mu_rg = 255, mu_yb = 127.5
    val expect = math.floor(
      0.3 * math.sqrt(255.0 * 255 + 127.5 * 127.5) * 1e4) / 1e4
    assert(out(2L) === expect)
    // driver data: nonnegative everywhere
    val drv = SparkEntry.queries("mm_image_colorfulness")(spark, sf).collect()
    assert(drv.nonEmpty)
    drv.foreach(r => assert(r.getAs[Double]("colorfulness") >= 0.0))
  }
}
