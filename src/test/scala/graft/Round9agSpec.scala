package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-32 gates (SURVEY §2.28). */
class Round9agSpec extends SparkSpec {

  test("agg_skew_kurtosis: moments replay driver-side on exact cents") {
    val out = SparkEntry.queries("agg_skew_kurtosis")(spark, sf).collect()
    assert(out.nonEmpty)
    val cents = sources.Tables.t(spark, sf, "lineitem")
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(12,2)") * lit(100))
          .cast("long").as("c"))
      .collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("c"))
    val byFlag = cents.groupBy(_._1)
    out.foreach { r =>
      val cs = byFlag(r.getAs[String]("l_returnflag")).map(_._2)
      val n = cs.length.toDouble
      // BigInt power sums == the engine's exact decimal accumulation
      val s1 = cs.map(BigInt(_)).sum.toDouble
      val s2 = cs.map(c => BigInt(c) * BigInt(c)).sum.toDouble
      val s3 = cs.map(c => BigInt(c) * BigInt(c) * BigInt(c)).sum.toDouble
      val s4 = cs.map(c => BigInt(c) * BigInt(c) * BigInt(c) * BigInt(c))
        .sum.toDouble
      val m1 = s1 / n
      val m2 = (s2 / n) - (m1 * m1)
      val m3 = (s3 / n) - (3.0 * m1 * (s2 / n)) + (2.0 * m1 * m1 * m1)
      val m4 = (s4 / n) - (4.0 * m1 * (s3 / n)) +
        (6.0 * m1 * m1 * (s2 / n)) - (3.0 * m1 * m1 * m1 * m1)
      def t6(x: Double) = math.floor(x * 1e6) / 1e6
      assert(r.getAs[Long]("n") === cs.length.toLong)
      // replay within one trunc6 step (driver fold order differs from
      // the engine's exact-decimal sums only at the double conversion)
      assert(math.abs(r.getAs[Double]("skewness") -
        t6(m3 / (m2 * math.sqrt(m2)))) <= 1e-6)
      assert(math.abs(r.getAs[Double]("kurtosis_ex") -
        t6((m4 / (m2 * m2)) - 3.0)) <= 1e-6)
    }
  }

  test("ts_spc_rules: every emitted row fires >=1 rule; r1 rows are |z|>3") {
    val out = SparkEntry.queries("ts_spc_rules")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val fired = r.getAs[Int]("r1") + r.getAs[Int]("r2") +
        r.getAs[Int]("r3") + r.getAs[Int]("r4")
      assert(fired >= 1)
      if (r.getAs[Int]("r1") === 1)
        assert(math.abs(r.getAs[Double]("z")) > 3.0)
      else
        assert(math.abs(r.getAs[Double]("z")) <= 3.0 ||
          fired > 1 || r.getAs[Int]("r1") === 0)
    }
  }

  test("serve_session_replay: per-user contiguous idx, dwell consistent") {
    val out = SparkEntry.queries("serve_session_replay")(spark, sf)
      .collect()
    assert(out.map(_.getAs[Long]("user_id")).distinct.sorted ===
      Seq(3L, 7L, 11L))
    out.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("idx"))
      assert(sorted.map(_.getAs[Long]("idx")).toSeq ===
        (1L to sorted.length))
      assert(sorted.head.getAs[Long]("dwell_s") === 0L)
      assert(sorted.head.getAs[Long]("session_no") === 1L)
      // session numbers are non-decreasing and bump by at most 1
      val sess = sorted.map(_.getAs[Long]("session_no")).toSeq
      sess.sliding(2).foreach {
        case Seq(a, b) => assert(b === a || b === a + 1)
        case _         =>
      }
    }
  }
}
