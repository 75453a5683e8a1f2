package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-62 gates (SURVEY §2.28). */
class Round9bkSpec extends SparkSpec {

  test("agg_mann_whitney: U bounded by n1*n0, null split not significant") {
    val out = SparkEntry.queries("agg_mann_whitney")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      val n1 = r.getAs[Long]("n1"); val n0 = r.getAs[Long]("n0")
      assert(n1 > 0 && n0 > 0)
      val u = r.getAs[Double]("u_stat")
      // 0 <= U <= n1*n0 always
      assert(u >= 0.0 && u <= n1.toDouble * n0 + 1e-6)
      // the verdict is exactly the 1.96 cut on the trunc4'd z
      val z = r.getAs[Double]("z_score")
      assert(r.getAs[Int]("significant") ===
        (if (math.abs(z) > 1.96) 1 else 0))
    }
    // events cluster by user (the arm is user-level), so a tiny corpus
    // can trip a type or two — but a fair hash must not reject everywhere
    assert(out.count(_.getAs[Int]("significant") === 0) >= 3)
  }

  test("ts_stl_strength: strengths in [0,1], seasonal signal present") {
    val out = SparkEntry.queries("ts_stl_strength")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getAs[Long]("n_hours") > 100)
      val ft = r.getAs[Double]("f_trend")
      val fs = r.getAs[Double]("f_seasonal")
      assert(ft >= 0.0 && ft <= 1.0)
      assert(fs >= 0.0 && fs <= 1.0)
    }
  }

  test("ds_reduce_latest: typed reduction equals the max_by twin") {
    val out = SparkEntry.queries("ds_reduce_latest")(spark, sf)
    val rows = out.collect()
    val users = sources.Tables.t(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(rows.length === users.toInt)
    // cross-check one user against a direct relational argmax
    val relational = sources.Tables.t(spark, sf, "events")
      .select(col("user_id"),
        expr("unix_micros(cast(ts as timestamp))").as("us"),
        col("event_id"))
      .groupBy("user_id")
      .agg(max(struct(col("us"), col("event_id"))).as("k"))
      .select(col("user_id"), col("k.event_id").as("eid"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("eid"))
      .toMap
    rows.foreach { r =>
      assert(relational(r.getAs[Long]("user_id")) ===
        r.getAs[Long]("last_event_id"))
    }
  }
}
