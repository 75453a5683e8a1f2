package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-26 gates (SURVEY §2.28). */
class Round9aaSpec extends SparkSpec {

  test("sample_hard_negatives: every negative is near but wrong-labeled") {
    val out = SparkEntry.queries("sample_hard_negatives")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Int]("q_label") !== r.getAs[Int]("n_label"))
      assert(r.getAs[Long]("neg_rank") >= 1L && r.getAs[Long]("neg_rank") <= 3L)
    }
    // within a query, negatives are score-descending (the HARDEST first)
    out.groupBy(_.getAs[Long]("qid")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("neg_rank"))
      val scores = sorted.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("pipeline_epoch_plan: budget flattens, caps bind, masses conserve") {
    import spark.implicits._
    // 90/10 corpus: uniform half-budget gives the tail lang a capped
    // repeat and the head lang a fractional one
    val docs = (Seq.fill(9)("en") :+ "fr").zipWithIndex.map { case (l, i) =>
      (i.toLong, "a b c d e f g h i j", l, "s", 20L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = operators.QRound9aa.epochPlan(docs).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("mass"), r.getAs[Long]("repeat6"),
          r.getAs[Long]("tokens_out"), r.getAs[Long]("capped"))).toMap
    // masses: en 90 toks, fr 10; total 100; budget 200; per-lang 100
    assert(out("en")._1 === 90L)
    assert(out("fr")._1 === 10L)
    // en: 100*1e6/90 = 1111111 (trunc); fr: 100*1e6/10 = 10e6 -> cap 4e6
    assert(out("en")._2 === 1111111L)
    assert(out("fr")._2 === 4000000L)
    assert(out("fr")._4 === 1L)
    assert(out("en")._4 === 0L)
    // tokens_out = repeat6*mass/1e6
    assert(out("en")._3 === (1111111L * 90L) / 1000000L)
    assert(out("fr")._3 === 40L)
  }

  test("agg_audience_overlap: bitmap counts equal exact set algebra") {
    import spark.implicits._
    import java.sql.Timestamp
    // type a: users {1, 64, 65}; type b: users {1, 65, 200}; c: {300}
    val rows = Seq(("a", 1L), ("a", 64L), ("a", 65L),
      ("b", 1L), ("b", 65L), ("b", 200L), ("c", 300L))
    val ev = rows.zipWithIndex.map { case ((tp, u), i) =>
      (i.toLong, Timestamp.valueOf("2024-01-01 00:00:00"), u, tp, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = operators.QRound9aa.audienceOverlap(ev).collect()
      .map(r => (r.getAs[String]("t1"), r.getAs[String]("t2")) ->
        (r.getAs[Long]("n1"), r.getAs[Long]("n2"), r.getAs[Long]("inter"),
          r.getAs[Long]("uni"))).toMap
    assert(out(("a", "b")) === ((3L, 3L, 2L, 4L)))
    // pairs with empty intersections are absent (no co-bucketed words)
    assert(!out.contains(("a", "c")))
    assert(!out.contains(("b", "c")))
  }

  test("wave-26 keys registered with oracles") {
    Seq("sample_hard_negatives", "pipeline_epoch_plan", "agg_audience_overlap")
      .foreach { k =>
        assert(SparkEntry.queries.contains(k), s"$k not registered")
        assert(SparkEntry.oracleSql.contains(k), s"$k has no oracle")
      }
  }
}
