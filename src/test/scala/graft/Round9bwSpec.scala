package graft

/** Round-9 wave-74 gates (SURVEY §2.28). */
class Round9bwSpec extends SparkSpec {

  test("text_bm25_retrieval: ranked top-20, scores descending positive") {
    val out = SparkEntry.queries("text_bm25_retrieval")(spark, sf).collect()
    assert(out.length === 20)
    assert(out.map(_.getAs[Int]("rnk")).toSeq === (1 to 20))
    val scores = out.map(_.getAs[Double]("bm25_score")).toSeq
    assert(scores === scores.sortBy(-_))
    out.foreach { r =>
      val m = r.getAs[Long]("n_terms_matched")
      assert(m >= 1 && m <= 3)
    }
    // the ranking is non-degenerate: a strictly positive top score
    assert(scores.head > 0.0)
  }

  test("scan_txn_log_replay: snapshot equals the expected survivor set") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("scan_txn_log_replay")(spark, sf)
    val expected = graft.sources.Tables.t(spark, sf, "orders")
      .filter(col("o_orderkey") % 3 =!= 0)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("o_totalprice") * lit(100) + lit(0.5))
          .cast(org.apache.spark.sql.types.LongType)).as("cents"))
      .orderBy("o_orderpriority")
    assert(out.collect().toSeq === expected.collect().toSeq)
  }

  test("serve_symspell_suggest: every typo recovers its source term " +
    "among candidates") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("serve_symspell_suggest")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_candidates") >= 1)
      assert(r.getAs[String]("best_term").nonEmpty)
      assert(r.getAs[Long]("best_count") > 0)
      // the suggestion is within edit distance 1 of the typo by
      // construction of the candidate sets: deleting the right char
      // from the best term yields the typo, or vice versa, or equal
      val typo = r.getAs[String]("typo")
      val best = r.getAs[String]("best_term")
      assert(math.abs(typo.length - best.length) <= 1)
    }
  }
}
