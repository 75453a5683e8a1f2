package graft

import java.sql.Timestamp
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Round-9 wave-21 gates (SURVEY §2.28). */
class Round9vSpec extends SparkSpec {

  test("chp_absorbing_prob: planted chain hits conversion on schedule") {
    import spark.implicits._
    def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val ev = Seq(
      (1L, 1L, ts(1), "a"), (2L, 1L, ts(2), "b"), (3L, 1L, ts(3), "purchase"),
      (4L, 2L, ts(1), "c"), (5L, 2L, ts(2), "a"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = operators.QRound9v.absorbingProb(ev).collect()
      .map(r => r.getAs[String]("state") ->
        (r.getAs[Long]("p12_1"), r.getAs[Long]("p12_2"),
          r.getAs[Long]("p12_3"), r.getAs[Long]("p12_4"))).toMap
    val T = 1000000000000L
    // chain: a->b->purchase, c->a; purchase pinned at 1 forever
    assert(out("purchase") === ((T, T, T, T)))
    assert(out("b") === ((T, T, T, T))) // one step from conversion
    assert(out("a") === ((0L, T, T, T))) // two steps
    assert(out("c") === ((0L, 0L, T, T))) // three steps
    // driver data: probabilities monotone in k and within [0, 1e12]
    val drv = SparkEntry.queries("chp_absorbing_prob")(spark, sf).collect()
    assert(drv.length === 5)
    drv.foreach { r =>
      val ps = Seq(r.getAs[Long]("p12_1"), r.getAs[Long]("p12_2"),
        r.getAs[Long]("p12_3"), r.getAs[Long]("p12_4"))
      assert(ps.forall(p => p >= 0 && p <= T))
      assert(ps.zip(ps.tail).forall { case (x, y) => x <= y },
        s"non-monotone hitting probability: $ps")
    }
  }

  test("ds_observe_metrics: the observed metrics ride the query execution") {
    val obs = Observation()
    val out = operators.QRound9v.observedAgg(
      graft.sources.Tables.t(spark, sf, "events"), Some(obs)).collect()
    val metrics = obs.get
    // the zero-extra-pass audit equals the rollup's own totals
    assert(metrics("obs_rows").asInstanceOf[Long] ===
      out.map(_.getAs[Long]("n")).sum)
    assert(metrics("obs_cents").asInstanceOf[Long] ===
      out.map(_.getAs[Long]("cents_total")).sum)
  }

  test("sql_lateral_view: plans as a Generate, matches the DataFrame twin") {
    val drv = SparkEntry.queries("sql_lateral_view")(spark, sf)
    val plan = drv.queryExecution.optimizedPlan.toString
    assert(plan.contains("Generate"), s"no Generate node in:\n$plan")
    val rows = drv.collect()
    assert(rows.length <= 30 && rows.nonEmpty)
    val twin = graft.sources.Tables.t(spark, sf, "documents")
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("tok"))
      .filter(col("tok") =!= "" && length(col("tok")) >= 3)
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(30)
      .collect()
    assert(rows.map(_.toString).toSeq === twin.map(_.toString).toSeq)
  }
}
