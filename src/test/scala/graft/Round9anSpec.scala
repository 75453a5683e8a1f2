package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-39 gates (SURVEY §2.28). */
class Round9anSpec extends SparkSpec {

  test("sim_eval_mrr_ndcg: metric invariants hold per query") {
    val out = SparkEntry.queries("sim_eval_mrr_ndcg")(spark, sf).collect()
    assert(out.length === 20)
    out.foreach { r =>
      val (mrr, ndcg, prec) = (r.getAs[Double]("mrr"),
        r.getAs[Double]("ndcg"), r.getAs[Double]("prec_k"))
      assert(mrr >= 0.0 && mrr <= 1.0)
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9)
      assert(prec >= 0.0 && prec <= 1.0)
      val hits = r.getAs[Long]("hits")
      // zero hits forces all three metrics to zero; any hit forces all >0
      if (hits === 0L) assert(mrr === 0.0 && ndcg === 0.0 && prec === 0.0)
      else assert(mrr > 0.0 && ndcg > 0.0 && prec > 0.0)
      // MRR is 1/rank: bounded by 1 and at least 1/k
      // mrr is trunc4(1/rank): bounded below by trunc4(1/k)
      if (hits > 0L)
        assert(mrr >= math.floor(1e4 / r.getAs[Long]("k")) / 1e4 - 1e-9)
    }
  }

  test("fn_printf_format: formatting replays via Java Formatter") {
    val out = SparkEntry.queries("fn_printf_format")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val k = r.getAs[Long]("o_orderkey")
      assert(r.getAs[String]("order_tag") === "ORD-%07d".format(k))
      assert(r.getAs[String]("key_hex") === "%x".format(k))
      val cell = r.getAs[String]("prio_cell")
      // %-12s pads to >=12 but never truncates longer priorities
      assert(cell.startsWith("[") && cell.endsWith("]"))
      assert(cell.length >= 14)
    }
  }

  test("ts_wma_linear: WMA replays on a planted window") {
    val out = SparkEntry.queries("ts_wma_linear")(spark, sf).collect()
    assert(out.nonEmpty)
    // group rows per type, replay one WMA from the daily x values
    val byType = out.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Any]("day").toString)
      // need the 6 preceding x values: replay the LAST row from the
      // trailing 7 x's of the emitted (already full-window) series
      if (sorted.length >= 7) {
        val xs = sorted.takeRight(7).map(_.getAs[Double]("x"))
        val w = (0 until 7).map(k => xs(6 - k) * (7 - k)).sum
        val expect = math.floor(w / 28.0 * 1e4) / 1e4
        assert(math.abs(sorted.last.getAs[Double]("wma") - expect) <= 1e-4)
      }
    }
  }
}
