package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-13 gates (SURVEY §2.27). */
class Round9nSpec extends SparkSpec {

  test("text_hashing_tf: same term always lands in the same bucket") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta alpha"), (2L, "alpha")).toDF("doc_id", "text")
    val out = operators.QRound9n.hashingTf(docs).collect()
    // doc 1: alpha x2 + beta x1; doc 2: alpha x1, same bucket as doc 1's
    val d1 = out.filter(_.getAs[Long]("doc_id") == 1L)
    val d2 = out.filter(_.getAs[Long]("doc_id") == 2L)
    assert(d1.map(_.getAs[Long]("tf")).sum === 3L)
    assert(d2.length === 1 && d2.head.getAs[Long]("tf") === 1L)
    val alphaBucket = d2.head.getAs[Int]("bucket")
    assert(d1.exists(r => r.getAs[Int]("bucket") == alphaBucket &&
      r.getAs[Long]("tf") >= 2L))
    // driver data: buckets within range, tf conservation vs a direct count
    val drv = SparkEntry.queries("text_hashing_tf")(spark, sf)
    assert(drv.filter(col("bucket") < 0 || col("bucket") >= 16).count() === 0)
  }

  test("sample_bootstrap_hash: replicates differ but stay near the corpus mass") {
    val drv = SparkEntry.queries("sample_bootstrap_hash")(spark, sf).collect()
    assert(drv.length === 3)
    drv.foreach { r =>
      // Poisson(1): ~63% of docs in-replicate, mass ratio near 1
      val ratio = r.getAs[Double]("mass_ratio")
      assert(ratio > 0.5 && ratio < 1.5, s"implausible mass ratio $ratio")
      assert(r.getAs[Long]("n_draws") >= r.getAs[Long]("n_docs_in"))
    }
    // the three replicates are distinct draws, not copies
    assert(drv.map(_.getAs[Long]("n_draws")).distinct.length > 1)
    // deterministic: a rerun reproduces the replicate table exactly
    val again = SparkEntry.queries("sample_bootstrap_hash")(spark, sf).collect()
    assert(again.map(_.toString).sorted === drv.map(_.toString).sorted)
  }

  test("sql_group_by_all: resolves to the same result as explicit grouping") {
    val all = SparkEntry.queries("sql_group_by_all")(spark, sf)
      .collect().map(_.toString).sorted
    graft.sources.Tables.t(spark, sf, "orders")
      .createOrReplaceTempView("g_orders")
    val explicit = spark.sql(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM g_orders GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)
      .collect().map(_.toString).sorted
    assert(all === explicit)
    assert(all.nonEmpty)
  }

  test("chp_calibration_ece: the summary re-derives from the bins table") {
    val ece = SparkEntry.queries("chp_calibration_ece")(spark, sf).collect()
    assert(ece.length === 1)
    val r = ece.head
    // hand-recompute from the reliability table
    val bins = operators.QRound7d.queries("chp_calibration_bins")(spark, sf)
      .collect()
    val n = bins.map(_.getAs[Long]("n_users")).sum
    val gaps = bins.map { b =>
      val conf = 1.0 / (1.0 + math.exp(-b.getAs[Double]("avg_score")))
      val g = math.abs(
        math.floor(conf * 1e4 + 0.5) -
          math.floor(b.getAs[Double]("churn_rate") * 1e4 + 0.5)).toLong
      (b.getAs[Long]("n_users"), g)
    }
    val expectEce = math.floor(
      gaps.map { case (nb, g) => nb * g }.sum.toDouble / (n * 1e4) * 1e6) / 1e6
    assert(r.getAs[Long]("n_total") === n)
    assert(r.getAs[Long]("n_bins") === bins.length.toLong)
    assert(r.getAs[Double]("ece") === expectEce)
    assert(r.getAs[Double]("ece") >= 0.0 && r.getAs[Double]("ece") <= 1.0)
  }
}
