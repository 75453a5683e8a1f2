package graft

import org.apache.spark.sql.functions._

/** Gates for the round-5 seventh wave (QRound5g): bitmap-vs-exact
  * equality, vacuum conservation, and the tolerance cut. */
class Round5gSpec extends SparkSpec {
  import spark.implicits._

  test("agg_bitmap_distinct: bitmap count equals count(distinct) everywhere") {
    val out = SparkEntry.queries("agg_bitmap_distinct")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_distinct_bitmap") === r.getAs[Long]("n_distinct_exact"),
        s"bitmap distinct diverges for ${r.getAs[String]("event_type")}")
    }
  }

  test("maint_vacuum_ttl: kept + deleted conserves, kept rows respect the cutoff") {
    val out = SparkEntry.queries("maint_vacuum_ttl")(spark, sf)
    val totals = sources.Tables.t(spark, sf, "events")
      .groupBy("event_type").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // a type whose rows were ALL wrongly deleted would vanish from the
    // output entirely (kept-side join) — pin the row count first
    assert(out.count() === totals.size.toLong,
      "an event_type disappeared from the vacuum report")
    out.collect().foreach { r =>
      val typ = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_deleted") === totals(typ),
        s"vacuum lost rows for $typ")
      assert(r.getAs[Long]("n_kept") > 0, s"vacuum deleted everything for $typ")
    }
    // the cutoff must actually delete something (20-day TTL on a ~30-day span)
    assert(out.agg(sum("n_deleted")).as[Long].head() > 0,
      "TTL vacuum deleted nothing — cutoff is wrong")
    // and every kept row must be inside the TTL
    val obs = sources.Tables.t(spark, sf, "events")
      .agg(expr("max(unix_micros(cast(ts as timestamp)))")).as[Long].head()
    val minKept = out.agg(min("min_day_kept")).as[Long].head()
    assert(minKept >= (obs - 20L * 86400000000L) / 86400000000L,
      "a kept row is older than the TTL cutoff")
  }

  test("join_asof_tolerance: every match is a real prior view within 30 minutes") {
    val out = SparkEntry.queries("join_asof_tolerance")(spark, sf).persist()
    val nPurch = sources.Tables.t(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(out.count() === nPurch, "one output row per purchase")
    // matched rows: gap in [0, 1800]; unmatched: both columns null together
    assert(out.filter(col("view_us").isNotNull &&
      (col("gap_s") < 0 || col("gap_s") > 1800)).count() === 0L)
    assert(out.filter(col("view_us").isNull =!= col("gap_s").isNull).count() === 0L)
    // spot-check one matched purchase against a brute-force lookup
    val sample = out.filter(col("view_us").isNotNull)
      .orderBy("user_id", "purchase_id").limit(1).collect()
    if (sample.nonEmpty) {
      val r = sample(0)
      val uid = r.getAs[Long]("user_id")
      val ev = sources.Tables.t(spark, sf, "events")
        .filter(col("user_id") === uid)
        .select(col("event_id"), col("event_type"),
          expr("unix_micros(cast(ts as timestamp))").as("us"))
        .as[(Long, String, Long)].collect()
      val pUs = ev.find(_._1 == r.getAs[Long]("purchase_id")).get._3
      val bestView = ev.filter(e => e._2 == "view" && e._3 <= pUs)
        .map(_._3).maxOption
      assert(bestView.contains(r.getAs[Long]("view_us")),
        "window as-of result differs from brute-force lookup")
    }
    out.unpersist()
  }
}
