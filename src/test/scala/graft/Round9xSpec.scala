package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-23 gates (SURVEY §2.28). */
class Round9xSpec extends SparkSpec {

  test("text_edit_similarity: scores the LSH pairs with exact Levenshtein") {
    val out = SparkEntry.queries("text_edit_similarity")(spark, sf).collect()
    assert(out.nonEmpty, "no LSH candidate pairs to score")
    // every row is a verified near-dup: high edit similarity expected on
    // the synthetic corpus, and the similarity must re-derive from lev_d
    val docs = sources.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    out.foreach { r =>
      val (a, b) = (docs(r.getAs[Long]("a_id")), docs(r.getAs[Long]("b_id")))
      val lev = r.getAs[Long]("lev_d")
      val expectSim = math.floor((1.0 - lev.toDouble /
        math.max(a.length, b.length)) * 1e4) / 1e4
      assert(r.getAs[Double]("edit_sim") === expectSim)
      assert(lev >= 0 && lev <= math.max(a.length, b.length))
    }
  }

  test("sim_mmr_rerank: first pick is the top hit, later picks diversify") {
    val out = SparkEntry.queries("sim_mmr_rerank")(spark, sf).collect()
    val byQ = out.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size === 20)
    byQ.foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("sel_rank"))
      assert(sorted.map(_.getAs[Long]("sel_rank")).toSeq === (1L to 5L))
      // rank 1 maximizes pure relevance (mmr4 == rel4, no penalty yet)
      assert(sorted.head.getAs[Long]("mmr4") === sorted.head.getAs[Long]("rel4"))
      // the query vector itself is its own top hit (cosine ~1.0; trunc4
      // of the float->double self-dot can land one tick under 1e4)
      assert(sorted.head.getAs[Long]("vec_id") === qid)
      assert(sorted.head.getAs[Long]("rel4") >= 9999L)
      // no duplicates in the selection
      val vids = sorted.map(_.getAs[Long]("vec_id"))
      assert(vids.distinct.length === vids.length)
      // later picks carry a diversity penalty: mmr4 <= rel4
      sorted.tail.foreach { r =>
        assert(r.getAs[Long]("mmr4") <= r.getAs[Long]("rel4"))
      }
    }
  }

  test("sql_exists_correlated plans as one semi join (no per-row subquery)") {
    val df = SparkEntry.queries("sql_exists_correlated")(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), s"EXISTS not decorrelated:\n$plan")
    // and matches the DataFrame semi-join spelling row-for-row
    val cust = sources.Tables.t(spark, sf, "customer")
    val ord = sources.Tables.t(spark, sf, "orders")
      .filter(col("o_totalprice") > 400000)
    val twin = cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey").limit(50).collect()
    assert(df.collect().toSeq === twin.toSeq)
  }

  test("wave-23 keys registered with oracles") {
    Seq("text_edit_similarity", "sim_mmr_rerank", "sql_exists_correlated")
      .foreach { k =>
        assert(SparkEntry.queries.contains(k), s"$k not registered")
        assert(SparkEntry.oracleSql.contains(k), s"$k has no oracle")
      }
  }
}
