package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-34 gates (SURVEY §2.28). */
class Round9aiSpec extends SparkSpec {

  test("chp_propensity_match: caliper respected, matched pair is nearest") {
    val out = SparkEntry.queries("chp_propensity_match")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("diff") <= 1e-2 + 1e-9)
      // one row per treated user
    }
    assert(out.map(_.getAs[Long]("t_user")).distinct.length === out.length)
    // effect is the plain outcome difference
    out.foreach { r =>
      val eff = math.floor((r.getAs[Double]("t_outcome") -
        r.getAs[Double]("c_outcome")) * 1e4) / 1e4
      assert(r.getAs[Double]("effect") === eff)
    }
  }

  test("sample_neyman_alloc: allocations respect the budget and weights") {
    val out = SparkEntry.queries("sample_neyman_alloc")(spark, sf).collect()
    assert(out.length === 5)
    val totalAlloc = out.map(_.getAs[Long]("alloc")).sum
    assert(totalAlloc <= 500L) // floor rounding never exceeds the budget
    assert(totalAlloc >= 490L) // and loses at most one unit per stratum
    out.foreach { r =>
      assert(r.getAs[Long]("took") ===
        math.min(r.getAs[Long]("alloc"), r.getAs[Long]("n_h")))
      assert(r.getAs[Double]("s_h") > 0.0)
    }
  }

  test("mm_histogram_equalize: planted two-level image stretches to 0/255") {
    import spark.implicits._
    // 4x3 image: 8 dark pixels (30,30,30 -> gray 30), 4 bright
    // (200,200,200 -> gray 200). cdf: 8 then 12; remap dark -> 0,
    // bright -> 255*(12-8)/(12-8) = 255.
    val px = (Array.fill(8)(Array(30, 30, 30)) ++
      Array.fill(4)(Array(200, 200, 200))).flatten.map(_.toByte)
    val header = "P6\n4 3\n255\n".getBytes("US-ASCII")
    val media = Seq(operators.Multimodal.MediaRow(1L, header ++ px, "ppm"))
      .toDS()
    val out = operators.QRound9ai.histogramEqualize(media).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("levels_before") === 2L)
    assert(r.getAs[Long]("levels_after") === 2L)
    assert(r.getAs[Long]("min_after") === 0L)
    assert(r.getAs[Long]("max_after") === 255L)
    assert(r.getAs[Double]("mean_before") ===
      math.floor((8.0 * 30 + 4.0 * 200) / 12 * 1e4) / 1e4)
    assert(r.getAs[Double]("mean_after") ===
      math.floor(4.0 * 255 / 12 * 1e4) / 1e4)
  }
}
