package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-24 gates (SURVEY §2.28). */
class Round9ySpec extends SparkSpec {

  test("ts_holt_linear: constant series locks level, zero trend") {
    import spark.implicits._
    val daily = (0L to 9L).map(dn => ("a", dn, 5L))
      .toDF("event_type", "day_num", "cnt")
    val r = operators.QRound9y.holtLinear(daily).collect().head
    assert(r.getAs[Long]("n_days") === 10L)
    assert(r.getAs[Long]("level6") === 5000000L)
    assert(r.getAs[Long]("trend6") === 0L)
    assert(r.getAs[Long]("forecast6") === 5000000L)
    assert(r.getAs[Double]("forecast") === 5.0)
  }

  test("ts_holt_linear: hand-computed two-step recursion") {
    import spark.implicits._
    // x = [2, 4]: l0 = 2e6, b0 = 0
    // l1 = (4e6 + 2e6 + 0)/2 = 3e6; b1 = ((3e6-2e6) + 0)/2 = 5e5
    val daily = Seq(("a", 0L, 2L), ("a", 1L, 4L))
      .toDF("event_type", "day_num", "cnt")
    val r = operators.QRound9y.holtLinear(daily).collect().head
    assert(r.getAs[Long]("level6") === 3000000L)
    assert(r.getAs[Long]("trend6") === 500000L)
    assert(r.getAs[Long]("forecast6") === 3500000L)
  }

  test("ts_bollinger_bands: constant series has zero width, spike flags") {
    import spark.implicits._
    val flat = (0L to 9L).map(dn => ("a", dn, 10L)) :+ (("a", 10L, 30L))
    val out = operators.QRound9y
      .bollingerBands(flat.toDF("event_type", "day_num", "cnt"))
      .collect()
    // full windows start at day 6: days 6..10
    assert(out.length === 5)
    out.take(4).foreach { r =>
      assert(r.getAs[Double]("sd") === 0.0)
      assert(r.getAs[Long]("outside") === 0L)
    }
    val spike = out.last
    assert(spike.getAs[Long]("cnt") === 30L)
    // window [10x6, 30]: m = 90/7, the 30 sits far outside 2 sigma
    assert(spike.getAs[Long]("outside") === 1L)
    // flag must re-derive from the exact integer inequality
    out.foreach { r =>
      val (x, n) = (r.getAs[Long]("cnt"), 7L)
      val win = flat.filter { case (_, dn, _) =>
        dn <= r.getAs[Long]("day_num") && dn > r.getAs[Long]("day_num") - 7
      }.map(_._3)
      val (sx, sxx) = (win.sum, win.map(v => v * v).sum)
      val lhs = (n * x - sx) * (n * x - sx)
      val rhs = 4 * (n * sxx - sx * sx)
      assert(r.getAs[Long]("outside") === (if (lhs > rhs) 1L else 0L))
    }
  }

  test("graph_walk_corpus: planted path graph walks deterministically") {
    import spark.implicits._
    // star: 0 connected to 1,2,3; walker from 0 must pick the
    // md5-minimizing neighbor each step and can backtrack (it's a walk,
    // not a path)
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 0L), (2L, 0L), (3L, 0L))
      .toDF("src", "dst")
    val seeds = Seq(0L).toDF("vec_id")
    val out = operators.QRound9y.walkCorpus(seeds, edges).collect()
    assert(out.length === 5) // steps 0..4
    assert(out.map(_.getAs[Long]("step")).toSeq === (0L to 4L))
    assert(out.head.getAs[Long]("node") === 0L)
    // odd steps leave the hub, even steps must return to it
    assert(out(2).getAs[Long]("node") === 0L)
    assert(out(4).getAs[Long]("node") === 0L)
    assert(Set(1L, 2L, 3L).contains(out(1).getAs[Long]("node")))
    // determinism: a rerun yields the identical walk
    val out2 = operators.QRound9y.walkCorpus(seeds, edges).collect()
    assert(out.map(_.toSeq).toSeq === out2.map(_.toSeq).toSeq)
  }

  test("wave-24 keys registered with oracles") {
    Seq("ts_holt_linear", "ts_bollinger_bands", "graph_walk_corpus")
      .foreach { k =>
        assert(SparkEntry.queries.contains(k), s"$k not registered")
        assert(SparkEntry.oracleSql.contains(k), s"$k has no oracle")
      }
  }
}
