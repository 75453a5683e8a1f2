package graft

/** Round-9 wave-61 gates (SURVEY §2.28). */
class Round9bjSpec extends SparkSpec {

  test("dedup_best_of_cluster: keeper is a member, gain nonnegative") {
    val out = SparkEntry.queries("dedup_best_of_cluster")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_members") >= 2)
      val kept = r.getAs[Long]("kept_doc")
      val minid = r.getAs[Long]("minid_doc")
      // the min-id doc can never out-rank the argmax keeper
      assert(r.getAs[Double]("quality_gain") >= 0.0)
      assert(r.getAs[Int]("policy_differs") ===
        (if (kept != minid) 1 else 0))
      // min-id keeper is <= every member, in particular the kept one
      assert(minid <= kept)
    }
  }

  test("ts_changepoint_binseg: split interior, gain nonnegative") {
    val out = SparkEntry.queries("ts_changepoint_binseg")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      val n = r.getAs[Long]("n_days")
      val sp = r.getAs[Long]("split_after")
      assert(sp >= 1 && sp < n)
      // variance reduction of the best split is never negative
      assert(r.getAs[Double]("gain") >= -1e-4)
      assert(r.getAs[Double]("mean_left") > 0.0)
      assert(r.getAs[Double]("mean_right") > 0.0)
    }
  }

  test("fn_interval_arith: calendar identities hold") {
    val out = SparkEntry.queries("fn_interval_arith")(spark, sf).collect()
    assert(out.length === 400)
    out.foreach { r =>
      val q = r.getAs[Int]("q")
      assert(q >= 1 && q <= 4)
      val w = r.getAs[Int]("iso_week")
      assert(w >= 1 && w <= 53)
      val dow = r.getAs[Int]("dow1")
      assert(dow >= 1 && dow <= 7)
      // month_end is in the same month as the remade original date
      val remade = r.getAs[String]("remade")
      val monthEnd = r.getAs[String]("month_end")
      assert(remade.substring(0, 7) === monthEnd.substring(0, 7))
      assert(monthEnd >= remade)
      // +3 months stays a valid ISO date string
      assert(r.getAs[String]("plus3m").matches("\\d{4}-\\d{2}-\\d{2}"))
    }
  }
}
