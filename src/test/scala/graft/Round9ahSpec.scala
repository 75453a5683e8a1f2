package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-33 gates (SURVEY §2.28). */
class Round9ahSpec extends SparkSpec {

  test("sql_distinct_on: one row per customer, provably the latest") {
    val out = SparkEntry.queries("sql_distinct_on")(spark, sf).collect()
    val orders = sources.Tables.t(spark, sf, "orders")
      .select("o_custkey", "o_orderkey", "o_orderdate").collect()
    val latest = orders.groupBy(_.getAs[Long]("o_custkey")).map {
      case (ck, rows) =>
        ck -> rows.maxBy(r => (r.getAs[java.time.LocalDateTime]("o_orderdate")
          .toString, r.getAs[Long]("o_orderkey")))(
          Ordering.Tuple2(Ordering.String, Ordering.Long))
          .getAs[Long]("o_orderkey")
    }
    assert(out.length === latest.size)
    out.foreach { r =>
      assert(r.getAs[Long]("o_orderkey") ===
        latest(r.getAs[Long]("o_custkey")))
    }
  }

  test("emb_cluster_purity: counts partition the corpus, purity bounded") {
    val out = SparkEntry.queries("emb_cluster_purity")(spark, sf).collect()
    assert(out.nonEmpty)
    val total = sources.Tables.t(spark, sf, "embeddings").count()
    assert(out.map(_.getAs[Long]("n_cell")).sum === total)
    out.foreach { r =>
      val p = r.getAs[Double]("purity")
      assert(p > 0.0 && p <= 1.0)
      assert(r.getAs[Long]("maj_cnt") <= r.getAs[Long]("n_cell"))
    }
  }

  test("ts_winsorize: clamped mean moves toward the center, counts ~10%") {
    val out = SparkEntry.queries("ts_winsorize")(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      // exact P5/P95 cuts clamp ~5% per tail (ties can shift slightly)
      assert(r.getAs[Long]("n_lo") <= n * 0.08)
      assert(r.getAs[Long]("n_hi") <= n * 0.08)
      assert(r.getAs[Long]("n_hi") + r.getAs[Long]("n_lo") > 0)
      // winsorized mean is finite and close to the raw mean
      assert(math.abs(r.getAs[Double]("mean_winsor") -
        r.getAs[Double]("mean_raw")) <
        math.abs(r.getAs[Double]("mean_raw")) * 0.5 + 5.0)
    }
  }
}
