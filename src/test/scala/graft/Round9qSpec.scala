package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-16 gates (SURVEY §2.28). */
class Round9qSpec extends SparkSpec {

  test("join_spatial_grid: planted geometry counts exactly the in-radius set") {
    import spark.implicits._
    val proj = Seq(
      (0L, 0.0, 0.0), (1L, 0.1, 0.0), // queries (vec_id < 20)
      (30L, 0.45, 0.45), // d2=0.405 from q0: outside r^2=0.25
      (40L, 3.0, 3.0)) // far away
      .toDF("vec_id", "pc1", "pc2")
    val out = operators.QRound9q.spatialGrid(proj).collect()
      .map(r => r.getAs[Long]("qid") ->
        (r.getAs[Long]("n_within"), r.getAs[Double]("min_d2"))).toMap
    assert(out(0L) === ((1L, 0.01))) // only id 1 at d2 = 0.01
    assert(out(1L)._1 === 1L) // only id 0 (id 30 at d2 = 0.325)
    // driver data: every query reported once, -1 sentinel only when empty
    val drv = SparkEntry.queries("join_spatial_grid")(spark, sf).collect()
    assert(drv.length === 20)
    drv.foreach { r =>
      val (n, d) = (r.getAs[Long]("n_within"), r.getAs[Double]("min_d2"))
      assert((n == 0L && d == -1.0) || (n > 0L && d >= 0.0 && d <= 0.25))
    }
  }

  test("ts_periodogram_probe: a period-2 square wave lights up p=2 only") {
    import spark.implicits._
    val daily = (0 until 10).map(t =>
      ("a", t.toLong, if (t % 2 == 0) 10L else 2L))
      .toDF("event_type", "day_num", "cnt")
    val out = operators.QRound9q.periodogramProbe(daily).collect()
      .map(r => r.getAs[Int]("period") -> r.getAs[Double]("power")).toMap
    // centered: x~ = 10*x - 60 = +/-40; S_c(2) = 10*40 = 400 exactly
    // (the +0.5 absorbs cos ulps)
    assert(out(2) === 160000.0)
    assert(out(2) > out(7) * 10, s"p=2 ${out(2)} vs p=7 ${out(7)}")
    // driver data: power nonnegative, all types x periods present
    val drv = SparkEntry.queries("ts_periodogram_probe")(spark, sf).collect()
    assert(drv.length === 15) // 5 types x 3 periods
    drv.foreach(r => assert(r.getAs[Double]("power") >= 0.0))
  }

  test("pipeline_dataset_card: planted corpus summarizes exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c", "en", "web", 5L),
      (2L, "a b c", "en", "web", 5L), // exact dup of doc 1
      (3L, "x y", "fr", "books", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = operators.QRound9q.datasetCard(docs).collect().head
    assert(r.getAs[Long]("n_docs") === 3L)
    assert(r.getAs[Long]("n_langs") === 2L)
    assert(r.getAs[Long]("n_sources") === 2L)
    assert(r.getAs[Long]("total_chars") === 13L)
    assert(r.getAs[Long]("total_tokens") === 8L)
    assert(r.getAs[Long]("n_dup_docs") === 1L)
    assert(r.getAs[String]("top_lang") === "en")
    assert(r.getAs[Long]("top_lang_docs") === 2L)
    // driver data: card exists and counts are plausible
    val drv = SparkEntry.queries("pipeline_dataset_card")(spark, sf)
      .collect().head
    assert(drv.getAs[Long]("n_docs") > 0)
    assert(drv.getAs[Long]("total_tokens") > drv.getAs[Long]("n_docs"))
  }
}
