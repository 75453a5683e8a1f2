package graft

import org.apache.spark.sql.functions._

/** Gates for the round-5 sixth wave (QRound5f): recursion termination,
  * the star-flake shuffle budget, exact decay arithmetic, and
  * byte-conservation of the boilerplate strip. */
class Round5fSpec extends SparkSpec {
  import spark.implicits._

  test("sql_recursive_cte: covers every customer exactly once, depth = digits") {
    val out = SparkEntry.queries("sql_recursive_cte")(spark, sf)
    val total = out.agg(sum("n_nodes")).as[Long].head()
    val nCust = sources.Tables.t(spark, sf, "customer").count()
    // the anchor row IS customer 0 (keys are 0-based), so coverage = N
    assert(total === nCust,
      "walk must reach every customer exactly once")
    // parent = key div 10 => depth of key k is its digit count
    val rows = out.collect()
    rows.foreach { r =>
      val d = r.getAs[Int]("depth")
      if (d > 0) {
        assert(r.getAs[Long]("min_key") >= math.pow(10, d - 1).toLong.max(1),
          s"depth $d contains a key shallower than its digit count")
        assert(r.getAs[Long]("max_key") < math.pow(10, d).toLong,
          s"depth $d contains a key deeper than its digit count")
      }
    }
  }

  test("join_star_flake: all five dims broadcast — fact path pays the only shuffles") {
    val plan = SparkEntry.queries("join_star_flake")(spark, sf)
      .queryExecution.executedPlan.toString
    // the five explicit dims MUST broadcast; Catalyst may additionally
    // broadcast orders at test scale (it's under the 10 MB threshold
    // here; at 100 TB that join degrades to sort-merge automatically)
    val nBhj = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBhj >= 5, s"expected >=5 broadcast joins (one per dim), got $nBhj in:\n$plan")
    // shuffles: l_orderkey join (2 sides) + final groupBy partials = 3;
    // anything more means a dimension fell off the broadcast path
    val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nEx <= 3, s"expected <=3 hash exchanges (fact join + agg), got $nEx in:\n$plan")
  }

  test("chp_ltv_decay: decayed <= raw; week-0 users decay nothing; one user re-derived") {
    val out = SparkEntry.queries("chp_ltv_decay")(spark, sf)
    assert(out.filter(col("ltv_decayed") > col("raw_value") + 1e-9).count() === 0L,
      "decay can never increase value")
    // re-derive user 0 exactly, driver-side
    val ev = sources.Tables.t(spark, sf, "events")
      .filter(col("user_id") === 0)
      .select(expr("unix_micros(cast(ts as timestamp))").as("us"), col("value"))
      .as[(Long, Double)].collect()
    val obs = sources.Tables.t(spark, sf, "events")
      .agg(expr("max(unix_micros(cast(ts as timestamp)))")).as[Long].head()
    val decayed = ev.map { case (us, v) =>
      val vs = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .*(10000).toLongExact
      val wk = math.min((obs - us) / 604800000000L, 62L)
      vs / (1L << wk)
    }.sum
    val got = out.filter(col("user_id") === 0).collect()(0)
      .getAs[Double]("ltv_decayed")
    assert(got === math.floor(decayed / 10000.0 * 10000) / 10000.0,
      s"driver-side decay ${decayed / 10000.0} vs emitted $got")
  }

  test("text_boilerplate_strip: byte accounting is exact and only hits shrink") {
    val out = SparkEntry.queries("text_boilerplate_strip")(spark, sf).collect()
    val docs = sources.Tables.t(spark, sf, "documents")
    assert(out.map(_.getAs[Long]("n_docs")).sum === docs.count())
    out.foreach { r =>
      val saved = r.getAs[Long]("bytes_before") - r.getAs[Long]("bytes_after")
      val bpLen = r.getAs[String]("boilerplate").length
      val hits = r.getAs[Long]("n_stripped")
      assert(hits >= 1, "the dominant prefix must match at least one doc")
      // each stripped doc loses exactly prefix + one space, except docs
      // that WERE exactly the prefix (no trailing space to remove)
      assert(saved >= hits * bpLen && saved <= hits * (bpLen + 1),
        s"bytes saved $saved inconsistent with $hits strips of prefix length $bpLen")
    }
  }
}
