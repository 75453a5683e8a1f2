package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-66 gates (SURVEY §2.28). */
class Round9boSpec extends SparkSpec {

  test("chp_shapley_attribution: efficiency axiom and coherent touch counts") {
    val out = SparkEntry.queries("chp_shapley_attribution")(spark, sf)
      .collect()
    assert(out.map(_.getAs[String]("channel")).toSeq ===
      Seq("click", "error", "signup", "view"))
    out.foreach { r =>
      assert(r.getAs[Long]("n_touch") > 0)
      assert(r.getAs[Long]("n_touch_conv") <= r.getAs[Long]("n_touch"))
      assert(math.abs(r.getAs[Double]("shapley_value")) <= 1.0)
    }
    // efficiency: sum of Shapley values == v(full) - v(empty), re-derived
    // independently from the raw events
    val u = graft.sources.Tables.t(spark, sf, "events")
      .groupBy("user_id").agg(
        expr("bit_or(CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2 " +
          "WHEN 'signup' THEN 4 WHEN 'view' THEN 8 ELSE 0 END)").as("mask"),
        max(when(col("event_type") === "purchase", 1.0).otherwise(0.0))
          .as("conv"))
    def v(mask: Int): Double = {
      val r = u.filter(col("mask") === mask)
        .agg(avg("conv").as("v")).collect().head
      if (r.isNullAt(0)) 0.0 else r.getDouble(0)
    }
    val expected = v(15) - v(0)
    val got = out.map(_.getAs[Double]("shapley_value")).sum
    assert(math.abs(got - expected) < 1e-5)
  }

  test("emb_intrinsic_dim: estimate positive and plausible") {
    val out = SparkEntry.queries("emb_intrinsic_dim")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_anchors") > 50)
    assert(r.getAs[Long]("sum_lnmu_sc") > 0)
    val id = r.getAs[Double]("id_twonn")
    // positive, and bounded by a loose multiple of the ambient dim (64)
    assert(id > 0.0 && id < 200.0)
  }

  test("set_union_by_name: name-aligned union with null fill") {
    val out = SparkEntry.queries("set_union_by_name")(spark, sf).collect()
    assert(out.length === 5)
    val (rf, ls) = out.partition(_.getAs[String]("side") == "by_rf")
    assert(rf.length === 3 && ls.length === 2)
    rf.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("sum_qty")))
      assert(r.isNullAt(r.fieldIndex("avg_price")))
    }
    ls.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("sum_qty")))
      assert(!r.isNullAt(r.fieldIndex("avg_price")))
      assert(r.getAs[Double]("avg_price") > 0.0)
    }
    assert(out.forall(_.getAs[Long]("n") > 0))
  }
}
