package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-65 gates (SURVEY §2.28). */
class Round9bnSpec extends SparkSpec {

  test("emb_pq_audit: utilization and quality coherent") {
    val out = SparkEntry.queries("emb_pq_audit")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    val n = r.getAs[Long]("n_vectors")
    val used = r.getAs[Long]("n_codes_used")
    assert(n > 0)
    assert(used >= 1 && used <= 4096 && used <= n)
    assert(r.getAs[Long]("code_space") === 4096L)
    val util = r.getAs[Double]("utilization")
    assert(util > 0.0 && util <= 1.0)
    assert(math.abs(util - math.floor(used.toDouble / 4096 * 1e4) / 1e4)
      < 1e-9)
    val meanQ = r.getAs[Double]("mean_q")
    val minQ = r.getAs[Double]("min_q")
    assert(minQ <= meanQ + 1e-9)
    assert(meanQ > 0.0 && meanQ <= 1.0)
    assert(r.getAs[Long]("n_low_q") <= n)
  }

  test("sql_grouping_id: provenance bits consistent with sentinels") {
    val out = SparkEntry.queries("sql_grouping_id")(spark, sf).collect()
    assert(out.nonEmpty)
    var total = -1L; var detailSum = 0L
    out.foreach { r =>
      val gRf = r.getAs[Int]("g_rf"); val gLs = r.getAs[Int]("g_ls")
      val gid = r.getAs[Long]("gid")
      assert(gid === gRf * 2L + gLs)
      assert((r.getAs[String]("rf") == "_ALL") === (gRf == 1))
      assert((r.getAs[String]("ls") == "_ALL") === (gLs == 1))
      if (gid == 3L) { assert(total == -1L); total = r.getAs[Long]("n") }
      if (gid == 0L) detailSum += r.getAs[Long]("n")
    }
    assert(total > 0 && detailSum === total)
  }

  test("scan_glob_paths: recursive read reproduces the source exactly") {
    val out = SparkEntry.queries("scan_glob_paths")(spark, sf)
    val direct = spark.read.parquet(s"$sf/events.parquet")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("n_users"))
      .orderBy("event_type")
    assert(out.collect().toSeq === direct.collect().toSeq)
  }
}
