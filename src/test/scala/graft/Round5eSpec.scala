package graft

import org.apache.spark.sql.functions._

/** Gates for the round-5 fifth wave (QRound5e): the compression and
  * diagnostic properties the DuckDB hash-match can't see. */
class Round5eSpec extends SparkSpec {
  import spark.implicits._

  test("emb_pq_codebook: codes are 12-bit, codebook quantizes better than chance") {
    val out = SparkEntry.queries("emb_pq_codebook")(spark, sf).persist()
    val n = sources.Tables.t(spark, sf, "embeddings").count()
    assert(out.count() === n, "every vector must get a code")
    val range = out.agg(min("pq_code"), max("pq_code")).collect()(0)
    assert(range.getLong(0) >= 0L && range.getLong(1) < 4096L,
      "pq codes must pack into 12 bits (4 subspaces x 3 bits)")
    // codes must actually discriminate: many distinct codes in use
    val distinct = out.select("pq_code").distinct().count()
    assert(distinct > 20, s"only $distinct distinct PQ codes — codebook collapsed")
    // quantization quality: mean per-subspace cosine to the assigned
    // centroid should beat a null model by a wide margin
    val meanQ = out.agg(avg("q_score")).as[Double].head()
    assert(meanQ > 0.3, s"mean quantization similarity $meanQ too low")
    out.unpersist()
  }

  test("profile_key_skew: row counts conserved; ordering invariants hold") {
    val out = SparkEntry.queries("profile_key_skew")(spark, sf).collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getAs[Long]("min_cnt") <= r.getAs[Double]("p50_cnt"))
      assert(r.getAs[Double]("p50_cnt") <= r.getAs[Double]("p99_cnt"))
      assert(r.getAs[Double]("p99_cnt") <= r.getAs[Long]("max_cnt").toDouble)
      assert(r.getAs[Double]("skew_ratio") >= 1.0 - 1e-4,
        "max/avg skew ratio cannot be below 1")
    }
    val li = out.find(_.getAs[String]("key_col") == "lineitem.l_suppkey").get
    val expKeys = sources.Tables.t(spark, sf, "lineitem")
      .select("l_suppkey").distinct().count()
    assert(li.getAs[Long]("n_keys") === expKeys)
  }

  test("gen_synthetic_sales: exact driver-side regeneration of one store") {
    val out = SparkEntry.queries("gen_synthetic_sales")(spark, sf)
    val store0 = (0L until 1000000L).filter(_ * 2654435761L % 97 == 0)
    val exp = (store0.size.toLong,
      store0.map(_ * 2654435761L % 10000).sum,
      store0.map(_ * 40503L % 365).distinct.size.toLong)
    val row = out.filter(col("store_id") === 0).collect()(0)
    assert(row.getAs[Long]("n_sales") === exp._1)
    assert(row.getAs[Long]("total_cents") === exp._2)
    assert(row.getAs[Long]("n_days") === exp._3)
    // total conservation: sum of n_sales over stores = 1M
    assert(out.agg(sum("n_sales")).as[Long].head() === 1000000L)
  }
}
