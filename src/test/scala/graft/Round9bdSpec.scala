package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-55 gates (SURVEY §2.28). */
class Round9bdSpec extends SparkSpec {

  test("ts_holt_winters: forecast identity holds, season bounded") {
    val out = SparkEntry.queries("ts_holt_winters")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getAs[Long]("n_days") > 7)
      val l = r.getAs[Long]("level6"); val b = r.getAs[Long]("trend6")
      val sn = r.getAs[Long]("season6"); val f = r.getAs[Long]("forecast6")
      assert(f === l + b + sn)
      // the level tracks the series scale: positive for count data
      assert(l > 0)
      // the seasonal index is a deviation: far smaller than the level
      assert(math.abs(sn) < l)
      assert(math.abs(r.getAs[Double]("forecast") - f / 1e6) < 1e-5)
    }
  }

  test("graph_modularity: Q within bounds and better than random") {
    val out = SparkEntry.queries("graph_modularity")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_communities") >= 1)
    assert(r.getAs[Long]("n_edges") >= 1)
    val q = r.getAs[Double]("modularity")
    assert(q >= -0.5 && q <= 1.0)
    // LPA labels on its own graph: assortative by construction
    assert(q > 0.0)
  }

  test("join_asof_interp: estimates monotone over checkpoints, bracketed") {
    val out = SparkEntry.queries("join_asof_interp")(spark, sf).collect()
    assert(out.nonEmpty)
    // cumulative spend only grows with the checkpoint day
    out.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rows) =>
      val byQ = rows.sortBy(_.getAs[Long]("q_day"))
      val ests = byQ.map(_.getAs[Double]("est_spend"))
      assert(ests.forall(_ >= 0.0))
      assert(ests.toSeq === ests.sorted.toSeq)
    }
    // every purchasing user appears once per checkpoint
    val users = sources.Tables.t(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(out.length === users.toInt * 3)
  }
}
