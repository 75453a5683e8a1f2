package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-15 gates (SURVEY §2.27). */
class Round9pSpec extends SparkSpec {

  test("graph_stress_sampled: path chain geometry is integer-exact") {
    import spark.implicits._
    // chain 0-1-2-3 plus a parallel route 0-4-2: sigma(2)=2 via {1,4}
    val und = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 4L), (4L, 2L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val nodes = Seq(0L, 1L, 2L, 3L, 4L).toDF("vec_id")
    val sources = Seq(0L).toDF("vec_id")
    val out = operators.QRound9p.stressSampled(sources, nodes, edges)
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("stress")).toMap
    // from source 0: dist 1 = {1,4} (sigma 1 each), dist 2 = {2} (sigma 2),
    // dist 3 = {3} (sigma 2)
    // DAG: 1->2, 4->2, 2->3; sfx(2)=1, sfx(1)=sfx(4)=1+sfx(2)+... = 2
    // stress(1) = sigma(1)*sfx(1) = 2; stress(4) = 2
    // stress(2) = sigma(2)*sfx(2) = 2; stress(3): no suffix -> 0
    assert(out === Map(0L -> 0L, 1L -> 2L, 2L -> 2L, 3L -> 0L, 4L -> 2L))
    // driver data: stress nonnegative, zero for the unreached
    val drv = SparkEntry.queries("graph_stress_sampled")(spark, sf).collect()
    assert(drv.nonEmpty)
    drv.foreach(r => assert(r.getAs[Long]("stress") >= 0L))
    assert(drv.exists(_.getAs[Long]("stress") > 0L))
  }

  test("dedup_eval_prf: counts reconcile and ratios are exact") {
    val r = SparkEntry.queries("dedup_eval_prf")(spark, sf).collect().head
    val (np, nt, nh) = (r.getAs[Long]("n_pred"), r.getAs[Long]("n_truth"),
      r.getAs[Long]("n_hit"))
    assert(nh <= np && nh <= nt)
    assert(nt > 0, "no ground-truth pairs on the evaluation window?")
    if (np > 0)
      assert(r.getAs[Double]("prec") ===
        math.floor(nh.toDouble / np * 1e4) / 1e4)
    assert(r.getAs[Double]("recall") ===
      math.floor(nh.toDouble / nt * 1e4) / 1e4)
  }

  test("ts_autocorr_multi: a planted alternating series gives acf(k)=(-1)^k") {
    import spark.implicits._
    val daily = (0 until 14).map(d =>
      ("a", d.toLong, if (d % 2 == 0) 10L else 2L))
      .toDF("event_type", "day_num", "cnt")
    val out = operators.QRound9p.autocorrMulti(daily).collect()
      .map(r => r.getAs[Long]("lag") -> r.getAs[Double]("acf")).toMap
    for (k <- 1 to 7) {
      val expect = if (k % 2 == 0) 1.0 else -1.0
      assert(out(k.toLong) === expect, s"lag $k")
    }
    // driver data: lags complete per type, |acf| <= 1
    val drv = SparkEntry.queries("ts_autocorr_multi")(spark, sf).collect()
    assert(drv.nonEmpty)
    drv.foreach { r =>
      val a = r.getAs[Double]("acf")
      assert(a >= -1.000001 && a <= 1.0)
    }
  }
}
