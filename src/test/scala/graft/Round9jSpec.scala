package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Round-9 wave-9 gates (SURVEY §2.27). */
class Round9jSpec extends SparkSpec {

  test("chp_feature_drift: planted two-half shift reproduces the PSI formula") {
    import spark.implicits._
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00")
    // days 0..3 -> mid = 1; half0 = days {0,1}, half1 = days {2,3}
    val ev = Seq(
      // type a, half0: bins 0,0,1,1 ; half1: bins 0,1,1,1
      ("a", ts(0), 10.0), ("a", ts(1), 10.0), ("a", ts(0), 60.0), ("a", ts(1), 60.0),
      ("a", ts(2), 10.0), ("a", ts(3), 60.0), ("a", ts(2), 60.0), ("a", ts(3), 60.0),
      // type b: bin 7 appears only in half1 -> skipped bin
      ("b", ts(0), 10.0), ("b", ts(2), 10.0), ("b", ts(3), 380.0))
      .toDF("event_type", "ts", "value")
    val out = operators.QRound9j.featureDrift(ev).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n_first") === 4L && a.getAs[Long]("n_second") === 4L)
    assert(a.getAs[Long]("n_bins") === 2L && a.getAs[Long]("n_skipped") === 0L)
    // hand formula: (0.5-0.25)ln(2) + (0.5-0.75)ln(2/3), trunc6'd scale-sum
    val t0 = math.floor((0.5 - 0.25) * math.log(2.0 * 4 / (1.0 * 4)) * 1e12 + 0.5)
    val t1 = math.floor((0.5 - 0.75) * math.log(2.0 * 4 / (3.0 * 4)) * 1e12 + 0.5)
    val expected = math.floor((t0 + t1) / 1e12 * 1e6) / 1e6
    assert(a.getAs[Double]("psi") === expected)
    val b = out("b")
    assert(b.getAs[Long]("n_bins") === 1L && b.getAs[Long]("n_skipped") === 1L)
    // driver data: PSI is nonnegative by construction (sign(p-q)=sign(ln p/q))
    val drv = SparkEntry.queries("chp_feature_drift")(spark, sf).collect()
    assert(drv.nonEmpty)
    drv.foreach(r => assert(r.getAs[Double]("psi") >= 0.0))
  }

  test("ts_crosscorr_lag: a 2-day-shifted copy correlates 1.0 at lag 2") {
    import spark.implicits._
    val a = Seq(1L, 5L, 2L, 8L, 3L, 9L)
    val daily =
      (a.zipWithIndex.map { case (c, d) => ("A", d.toLong, c) } ++
       a.zipWithIndex.map { case (c, d) => ("B", d.toLong + 2, c) } ++
       // C = 10 - A at the same days: exact anti-correlation at lag 0
       a.zipWithIndex.map { case (c, d) => ("C", d.toLong, 10L - c) })
        .toDF("event_type", "day_num", "cnt")
    val out = operators.QRound9j.crosscorr(daily).collect()
      .map(r => (r.getAs[String]("type_x"), r.getAs[String]("type_y"),
        r.getAs[Long]("lag")) -> r.getAs[Double]("xcorr")).toMap
    assert(out(("A", "B", 2L)) === 1.0)
    assert(out(("A", "C", 0L)) === -1.0)
    // driver data: correlation bounded, lags complete
    val drv = SparkEntry.queries("ts_crosscorr_lag")(spark, sf).collect()
    assert(drv.nonEmpty)
    drv.foreach { r =>
      val x = r.getAs[Double]("xcorr")
      assert(x >= -1.000001 && x <= 1.0, s"out-of-range corr $x")
    }
  }

  test("graph_clustering_coeff: triangle-plus-pendant geometry is exact") {
    import spark.implicits._
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("vec_id")
    val out = operators.QRound9j.clusteringCoeff(nodes, edges).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("degree"), r.getAs[Long]("n_closed"),
          r.getAs[Double]("clust_coeff"))).toMap
    assert(out(1L) === ((3L, 1L, math.floor(2.0 / 6.0 * 1e6) / 1e6)))
    assert(out(2L) === ((2L, 1L, 1.0)))
    assert(out(3L) === ((2L, 1L, 1.0)))
    assert(out(4L) === ((1L, 0L, 0.0)))
    assert(out(5L) === ((0L, 0L, 0.0)))
    // driver data: coefficient in [0,1], closed wedges bounded by deg choose 2
    val drv = SparkEntry.queries("graph_clustering_coeff")(spark, sf).collect()
    assert(drv.nonEmpty)
    drv.foreach { r =>
      val (d, t, c) = (r.getAs[Long]("degree"), r.getAs[Long]("n_closed"),
        r.getAs[Double]("clust_coeff"))
      assert(c >= 0.0 && c <= 1.0)
      assert(t <= d * (d - 1) / 2)
    }
  }

  test("chp_sequence_match: ordered conversion pattern matches exactly") {
    import spark.implicits._
    def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val ev = Seq(
      (1L, 1L, ts(1), "view"), (2L, 1L, ts(2), "error"),
      (3L, 1L, ts(3), "click"), (4L, 1L, ts(4), "purchase"),
      (5L, 2L, ts(1), "purchase"), (6L, 2L, ts(2), "click"),
      (7L, 2L, ts(3), "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = operators.QRound9j.sequenceMatch(ev).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[String]("seq"), r.getAs[Int]("matched"))).toMap
    assert(out(1L) === (("vecp", 1)))
    assert(out(2L) === (("pcv", 0)))
    // driver data: sequence length == event count, matched is 0/1
    val drv = SparkEntry.queries("chp_sequence_match")(spark, sf).collect()
    assert(drv.nonEmpty)
    drv.foreach { r =>
      assert(r.getAs[String]("seq").length.toLong === r.getAs[Long]("n_events"))
      assert(Set(0, 1).contains(r.getAs[Int]("matched")))
    }
  }
}
