package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-11 gates (SURVEY §2.27). */
class Round9lSpec extends SparkSpec {

  test("sample_temperature_mix: low-resource langs up-sample, mass conserved") {
    import spark.implicits._
    val docs = Seq.tabulate(9)(i => (i.toLong, "a", 100L)) :+ ((9L, "b", 100L))
    val out = operators.QRound9l.temperatureMix(
        docs.toDF("doc_id", "lang", "n_chars")).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    assert(out("a").getAs[Double]("p_share") === 0.9)
    assert(out("b").getAs[Double]("p_share") === 0.1)
    // alpha=0.7 flattens: head down-weighted, tail up-weighted
    assert(out("a").getAs[Double]("boost") < 1.0)
    assert(out("b").getAs[Double]("boost") > 1.0)
    val qsum = out.values.map(_.getAs[Double]("q_share")).sum
    assert(math.abs(qsum - 1.0) < 2e-6, s"q shares sum to $qsum")
    // driver data: every boost positive, q defined for every lang
    val drv = SparkEntry.queries("sample_temperature_mix")(spark, sf).collect()
    assert(drv.nonEmpty)
    drv.foreach(r => assert(r.getAs[Double]("boost") > 0.0))
  }

  test("graph_hits_scores: planted star geometry is integer-exact") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("vec_id")
    val edges = Seq((1L, 3L), (2L, 3L), (4L, 3L), (3L, 1L)).toDF("src", "dst")
    val out = operators.QRound9l.hitsScores(nodes, edges).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("hub_score"), r.getAs[Long]("auth_score"))).toMap
    assert(out(3L) === ((12345L, 1000000L)))
    assert(out(1L) === ((1000000L, 12345L)))
    assert(out(2L) === ((1000000L, 0L)))
    assert(out(4L) === ((1000000L, 0L)))
    // driver data: scores bounded by the integer normalizer
    val drv = SparkEntry.queries("graph_hits_scores")(spark, sf).collect()
    assert(drv.nonEmpty)
    drv.foreach { r =>
      assert(r.getAs[Long]("hub_score") >= 0 &&
        r.getAs[Long]("hub_score") <= 1000000L)
      assert(r.getAs[Long]("auth_score") >= 0 &&
        r.getAs[Long]("auth_score") <= 1000000L)
    }
  }

  test("scan_csv_malformed: corrupt accounting matches the planted rule") {
    val drv = SparkEntry.queries("scan_csv_malformed")(spark, sf).collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_corrupt"),
          r.getAs[Long]("cents_good"))).toMap
    val truth = graft.sources.Tables.t(spark, sf, "events")
      .groupBy((col("user_id") % 10).as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_id") % 97 === 0, 1L).otherwise(0L)).as("c"),
        sum(when(col("event_id") % 97 =!= 0,
          floor(col("value") * lit(1e2) + lit(5e-1)).cast("long"))
          .otherwise(0L)).as("g"))
      .collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("n"), r.getAs[Long]("c"), r.getAs[Long]("g"))).toMap
    assert(drv === truth)
    assert(drv.values.map(_._2).sum > 0, "no corrupt rows planted?")
  }

  test("ts_theilsen_trend: median slope shrugs off a planted outlier day") {
    import spark.implicits._
    val daily = Seq(
      ("a", 0L, 0L), ("a", 1L, 2L), ("a", 2L, 4L), ("a", 3L, 6L),
      ("a", 4L, 1000L), // outlier day: 4 of 10 pairwise slopes explode
      ("b", 0L, 5L), ("b", 1L, 7L), ("b", 2L, 9L))
      .toDF("event_type", "day_num", "cnt")
    val out = operators.QRound9l.theilsenTrend(daily).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("slope_med"))).toMap
    assert(out("a") === ((10L, 2.0))) // least-squares would report ~200
    assert(out("b") === ((3L, 2.0)))
    // driver data: a slope exists for every event type
    val drv = SparkEntry.queries("ts_theilsen_trend")(spark, sf).collect()
    assert(drv.length === graft.sources.Tables.t(spark, sf, "events")
      .select("event_type").distinct().count())
  }
}
