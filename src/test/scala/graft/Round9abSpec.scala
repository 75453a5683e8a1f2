package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-27 gates (SURVEY §2.28). */
class Round9abSpec extends SparkSpec {

  test("text_rouge_overlap: clipped overlap bounded by both lengths") {
    val out = SparkEntry.queries("text_rouge_overlap")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (ov, la, lb) = (r.getAs[Long]("ov"), r.getAs[Long]("len_a"),
        r.getAs[Long]("len_b"))
      assert(ov >= 1L && ov <= math.min(la, lb),
        s"clipped overlap out of range: $ov vs ($la, $lb)")
      val f = math.floor(2.0 * ov / (la + lb) * 1e6) / 1e6
      assert(r.getAs[Double]("rouge1_f") === f)
      // near-dup pairs should overlap heavily
      assert(r.getAs[Double]("rouge1_f") > 0.5)
    }
  }

  test("sql_named_window plans one shared Window node") {
    val df = SparkEntry.queries("sql_named_window")(spark, sf)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = df.queryExecution.optimizedPlan
      .collect { case w: LWindow => w }
    assert(wins.length === 1, s"named window split into ${wins.length} nodes")
    assert(wins.head.partitionSpec.nonEmpty)
    // all three functions share the one frame
    assert(wins.head.windowExpressions.length === 3)
  }

  test("ts_seasonal_adjust: flat series adjusts to itself exactly") {
    import spark.implicits._
    val flat = (0L to 13L).map(dn => ("a", dn, 10L))
      .toDF("event_type", "day_num", "cnt")
    val out = operators.QRound9ab.seasonalAdjust(flat).collect()
    assert(out.length === 14)
    out.foreach { r =>
      assert(r.getAs[Long]("adj6") === 10000000L)
      assert(r.getAs[Double]("adjusted") === 10.0)
    }
    // weekend-heavy series: dow 0 always 20, others 10 -> dow-0 rows
    // deflate toward the series mean
    val season = (0L to 13L).map(dn =>
      ("a", dn, if (dn % 7 == 0) 20L else 10L))
      .toDF("event_type", "day_num", "cnt")
    val adj = operators.QRound9ab.seasonalAdjust(season).collect()
    val byDay = adj.map(r => r.getAs[Long]("day_num") -> r.getAs[Long]("adj6"))
      .toMap
    // tot=160, n=14, mean=80/7; dow0 mean=20 -> adj = 20*(80/7)/20 = 80/7
    assert(byDay(0L) === ((20L * 160L * 1000000L / 14L) * 2L) / 40L)
    // non-weekend day: adj = 10*(80/7)/10 = 80/7 as well (both strata
    // land on the series mean for this 2-level series)
    assert(byDay(1L) === ((10L * 160L * 1000000L / 14L) * 12L) / 120L)
  }

  test("wave-27 keys registered with oracles") {
    Seq("text_rouge_overlap", "sql_named_window", "ts_seasonal_adjust")
      .foreach { k =>
        assert(SparkEntry.queries.contains(k), s"$k not registered")
        assert(SparkEntry.oracleSql.contains(k), s"$k has no oracle")
      }
  }
}
