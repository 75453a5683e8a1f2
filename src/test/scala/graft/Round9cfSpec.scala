package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-83 gates (SURVEY §2.28). */
class Round9cfSpec extends SparkSpec {

  test("chp_sprt_sequential: verdicts well-formed, decided paths " +
    "have a day") {
    val out = SparkEntry.queries("chp_sprt_sequential")(spark, sf)
      .collect()
    assert(out.length === 2)
    assert(out.map(_.getAs[Int]("cohort")).toSeq === Seq(0, 1))
    out.foreach { r =>
      val v = r.getAs[String]("verdict")
      assert(Set("accept_h0", "accept_h1", "undecided").contains(v))
      val day = r.getAs[Long]("decision_day")
      if (v == "undecided") assert(day === -1L)
      else assert(day >= 0)
      val llr = r.getAs[Double]("final_llr")
      if (v == "accept_h1") assert(llr >= math.log(19.0) - 1e-3)
      if (v == "accept_h0") assert(llr <= -math.log(19.0) + 1e-3)
      assert(r.getAs[Long]("n_days") > 20)
    }
  }

  test("win_pareto_front: no member dominated by another member") {
    val out = SparkEntry.queries("win_pareto_front")(spark, sf).collect()
    assert(out.nonEmpty)
    // no front member strictly dominates another (lower price AND
    // higher volume both strictly)
    val pts = out.map(r => (r.getAs[Double]("unit_price"),
      r.getAs[Long]("volume")))
    for (a <- pts; b <- pts)
      assert(!(a._1 < b._1 && a._2 >= b._2))
    // against the raw data: the max-volume part is always on the front
    val per = graft.sources.Tables.t(spark, sf, "lineitem")
      .groupBy("l_partkey")
      .agg(sum(col("l_quantity").cast(org.apache.spark.sql.types.LongType))
        .as("v"))
    val maxVol = per.agg(max("v")).collect().head.getLong(0)
    assert(out.map(_.getAs[Long]("volume")).max === maxVol)
  }

  test("emb_neighbor_preservation: score in [0,1], anchors counted") {
    val out = SparkEntry.queries("emb_neighbor_preservation")(spark, sf)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_anchors") > 50)
    val p = r.getAs[Double]("preservation_at_5")
    assert(p >= 0.0 && p <= 1.0)
    // a 16-d sign projection preserves a nontrivial share of
    // neighborhoods — guard against a broken projection join
    assert(p > 0.05)
  }
}
