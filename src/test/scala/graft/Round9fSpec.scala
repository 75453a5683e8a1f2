package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-5 gates (SURVEY §2.27). */
class Round9fSpec extends SparkSpec {

  private def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")

  test("text_ccnet_tiers: planted 9-score lang splits 3/3/3 with shared-tie rule") {
    import spark.implicits._
    val lm = (1 to 9).map(i => (i.toLong, "en", 10L, i.toDouble))
      .toDF("doc_id", "lang", "n_bigrams", "lm_score")
    val docs = (1 to 9).map(i => (i.toLong, Seq.fill(10)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = operators.QRound9f.ccnetTiers(lm, docs).collect()
      .map(r => r.getAs[String]("tier") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("mean_score"))).toMap
    assert(out("tail") === ((3L, 2.0)))
    assert(out("mid") === ((3L, 5.0)))
    assert(out("head") === ((3L, 8.0)))
    // driver data: tiers partition each language's scored docs
    val drv = SparkEntry.queries("text_ccnet_tiers")(spark, sf).collect()
    val perLang = drv.groupBy(_.getAs[String]("lang"))
    assert(perLang.values.forall(_.map(_.getAs[Long]("n_docs")).sum > 0))
    assert(drv.forall(r => Set("head", "mid", "tail")(r.getAs[String]("tier"))))
  }

  test("pipeline_token_budget: planted histogram picks the exact threshold") {
    import spark.implicits._
    val lm = Seq((1L, 9e-1), (2L, 8e-1), (3L, 7e-1))
      .toDF("doc_id", "lm_score")
    val docs = Seq((1L, 40), (2L, 30), (3L, 50)).map { case (id, n) =>
      (id, Seq.fill(n)("w").mkString(" ")) }.toDF("doc_id", "text")
    val out = operators.QRound9f.tokenBudget(lm, docs).collect().head
    assert(out.getAs[Long]("total_tokens") === 120L)
    assert(out.getAs[Long]("budget_tokens") === 48L)
    assert(out.getAs[Double]("threshold_score") === 0.9)
    assert(out.getAs[Long]("n_selected") === 1L)
    assert(out.getAs[Long]("tokens_selected") === 40L)
    assert(out.getAs[Double]("utilization") === math.floor(40.0 / 48 * 1e4) / 1e4)
    // driver data: the budget is respected and something is selected
    val drv = SparkEntry.queries("pipeline_token_budget")(spark, sf).collect().head
    assert(drv.getAs[Long]("tokens_selected") <= drv.getAs[Long]("budget_tokens"))
    assert(drv.getAs[Long]("n_selected") > 0L)
    assert(drv.getAs[Double]("utilization") <= 1.0)
  }

  test("join_asof_nearest: closer side wins, tie goes to the earlier click") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, ts(1), "click"), (2L, 1L, ts(2), "purchase"),
      (3L, 1L, ts(4), "click"), (4L, 1L, ts(5), "purchase"),
      // user 2: exact tie (1h both sides) -> earlier click
      (5L, 2L, ts(1), "click"), (6L, 2L, ts(2), "purchase"),
      (7L, 2L, ts(3), "click"),
      // user 3: purchase with no clicks at all
      (8L, 3L, ts(1), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = operators.QRound9f.asofNearest(ev).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("nearest_click_us"), r.getAs[Long]("diff_us"))).toMap
    val h = 3600000000L
    def us(hh: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $hh%02d:00:00")
      .getTime * 1000L
    assert(out(2L) === ((us(1), h)), "purchase@2 nearest is click@1 (1h < 2h)")
    assert(out(4L) === ((us(4), h)), "purchase@5 nearest is click@4")
    assert(out(6L) === ((us(1), h)), "tie resolves to the EARLIER click")
    assert(out(8L) === ((-1L, -1L)), "no clicks -> -1 sentinel")
  }

  test("graph_degree_assort: star graph is perfectly disassortative") {
    import spark.implicits._
    val fwd = (1L to 4L).map(i => (0L, i))
    val edges = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
    val out = operators.QRound9f.degreeAssort(edges).collect().head
    assert(out.getAs[Long]("n_edges") === 8L)
    assert(out.getAs[Double]("assortativity") === -1.0,
      s"star graph must score -1, got ${out.getAs[Double]("assortativity")}")
  }
}
