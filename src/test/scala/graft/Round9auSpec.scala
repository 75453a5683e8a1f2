package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-46 gates (SURVEY §2.28). */
class Round9auSpec extends SparkSpec {

  test("chp_cuped_adjust: variance reduction bounded and consistent") {
    val out = SparkEntry.queries("chp_cuped_adjust")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n") > 0)
    val rho2 = r.getAs[Double]("rho2")
    assert(rho2 >= 0.0 && rho2 <= 1.0)
    val vy = r.getAs[Double]("var_y")
    val vAdj = r.getAs[Double]("var_y_adj")
    assert(vy > 0.0 && vAdj >= 0.0)
    // adjustment never inflates variance
    assert(vAdj <= vy + 1e-9)
    // var_y_adj == var_y * (1 - rho2) up to the independent trunc4 cuts
    assert(math.abs(vAdj - vy * (1 - rho2)) < vy * 2e-4 + 2e-4)
  }

  test("mm_brightness_centroid: centroid inside the image, exact mass") {
    val out = SparkEntry.queries("mm_brightness_centroid")(spark, sf).collect()
    assert(out.length === 500)
    out.foreach { r =>
      val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
      assert(w >= 4 && w <= 8 && h >= 3 && h <= 6)
      val mass = r.getAs[Long]("mass")
      // mass bounded by 3*255 per pixel
      assert(mass > 0 && mass <= 3L * 255 * w * h)
      val cx = r.getAs[Double]("com_x"); val cy = r.getAs[Double]("com_y")
      assert(cx >= 0.0 && cx <= w - 1.0)
      assert(cy >= 0.0 && cy <= h - 1.0)
    }
  }

  test("ds_typed_join: segments partition the joined orders exactly") {
    val out = SparkEntry.queries("ds_typed_join")(spark, sf)
    val rows = out.collect()
    assert(rows.length === 5)
    val totalJoined = rows.map(_.getAs[Long]("n_orders")).sum
    val orders = sources.Tables.t(spark, sf, "orders").count()
    // every order has a customer: the inner join drops nothing
    assert(totalJoined === orders)
    rows.foreach { r =>
      assert(r.getAs[Double]("total_price") > 0.0)
    }
    // the typed joinWith must still plan a broadcast hash join
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
