package graft

import graft.operators.QRound3
import org.apache.spark.sql.functions._

/** Round-5 second-wave gates (SURVEY §2.15): invariants the DuckDB hash
  * compare can't see — redaction completeness, interpolation bounds,
  * session conservation, the lateral-vs-window equivalence, and the
  * compaction file-count collapse the maint key exists for. */
class Round5bSpec extends SparkSpec {

  test("chp_sessionize_batch: conserves events; session numbering is dense") {
    val sess = SparkEntry.queries("chp_sessionize_batch")(spark, sf)
    val total = graft.sources.Tables.t(spark, sf, "events").count()
    val agg = sess.agg(
      sum("n_events").as("ne"),
      count(lit(1)).as("n_sess")).collect()(0)
    assert(agg.getAs[Long]("ne") === total,
      "sessions do not conserve the event count")
    // dense 1..k numbering per user: max(session_idx) == sessions-per-user
    val holes = sess.groupBy("user_id")
      .agg(max("session_idx").as("mx"), count(lit(1)).as("k"))
      .filter(col("mx") =!= col("k")).count()
    assert(holes === 0L, "session_idx numbering has holes")
    // every session's duration is non-negative and bounded by the corpus span
    assert(sess.filter(col("duration_s") < 0).count() === 0L)
  }

  test("agg_mode_median: matches a driver-side brute force on sf0.001") {
    val rows = SparkEntry.queries("agg_mode_median")(spark, sf).collect()
    val qty = graft.sources.Tables.t(spark, sf, "lineitem")
      .select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val vs = qty(flag)
      // deterministic mode: highest count, smallest value on ties
      val expMode = vs.groupBy(identity).view.mapValues(_.length).toSeq
        .maxBy { case (v, c) => (c, -v) }._1
      assert(r.getAs[Double]("mode_qty") === expMode, s"mode mismatch for $flag")
      // exact interpolated median
      val n = vs.length
      val expMed =
        if (n % 2 == 1) vs(n / 2) else (vs(n / 2 - 1) + vs(n / 2)) / 2.0
      assert(r.getAs[Double]("median_qty") === expMed, s"median mismatch for $flag")
      assert(r.getAs[Long]("n") === n.toLong)
    }
  }

  test("text_pii_redact: redacted text carries no email or long digit run") {
    // rebuild the redacted column with the operator's own expressions and
    // assert completeness directly — the query output only carries its md5
    val emailRe = "[A-Za-z0-9._%]+@[A-Za-z0-9.]+[.][A-Za-z]{2,}"
    val red = graft.sources.Tables.t(spark, sf, "documents")
      .withColumn("full_text", concat(
        col("text"), lit(" contact user"), col("doc_id"),
        lit("@mail.example.com or call "),
        (col("doc_id") * 7919 + 1000000).cast("string"),
        when(col("doc_id") % 3 === 0, lit(" alt 5551234567")).otherwise(lit("")),
        lit(" now")))
      .withColumn("red",
        regexp_replace(regexp_replace(col("full_text"), emailRe, "<EMAIL>"),
          "[0-9]{6,}", "<NUM>"))
    assert(red.filter(col("red").contains("@")).count() === 0L,
      "an email survived redaction")
    assert(red.filter(regexp_count(col("red"), lit("[0-9]{6,}")) > 0)
      .count() === 0L, "a long digit run survived redaction")
    // and the declared output sees the injected PII: 1 email each, a second
    // number on every third doc
    val out = SparkEntry.queries("text_pii_redact")(spark, sf)
    assert(out.filter(col("n_emails") =!= 1).count() === 0L)
    assert(out.filter(col("doc_id") % 3 === 0)
      .filter(col("n_nums") =!= 2).count() === 0L)
    assert(out.filter(col("doc_id") % 3 =!= 0)
      .filter(col("n_nums") =!= 1).count() === 0L)
  }

  test("ts_gap_interp: dense spine; interpolated values stay in series bounds") {
    val out = SparkEntry.queries("ts_gap_interp")(spark, sf)
    out.persist()
    try {
      // spine density: every (event_type, day) cell exactly once
      val types = out.select("event_type").distinct().count()
      val span = out.agg((max("day_num") - min("day_num") + 1).as("d"))
        .collect()(0).getAs[Long]("d")
      assert(out.count() === types * span, "spine has holes or duplicates")
      // linear interpolation never leaves the [min, max] of its series
      val bounds = out.filter(col("interp") === 0)
        .groupBy("event_type")
        .agg(min("val").as("lo"), max("val").as("hi"))
      val escaped = out.filter(col("interp") === 1)
        .join(bounds, Seq("event_type"))
        .filter(col("val") < col("lo") - lit(1e-6) ||
          col("val") > col("hi") + lit(1e-6))
        .count()
      assert(escaped === 0L, "interpolated value outside observed bounds")
    } finally out.unpersist()
  }

  test("sql_lateral_topk: equals the window-function top-k spelling") {
    import org.apache.spark.sql.expressions.Window
    val lat = SparkEntry.queries("sql_lateral_topk")(spark, sf)
      .collect().map(_.toString).toSeq
    val n = graft.sources.Tables.t(spark, sf, "nation")
    val c = graft.sources.Tables.t(spark, sf, "customer")
    val win = c.withColumn("rn", row_number().over(
        Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal").desc, col("c_name").asc)))
      .filter(col("rn") <= 3)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select("n_name", "c_name", "c_acctbal")
      .orderBy(col("n_name"), col("c_acctbal").desc, col("c_name"))
      .collect().map(_.toString).toSeq
    assert(lat === win, "lateral decorrelation diverges from window top-k")
  }

  test("sql_not_in_null: three-valued logic holds; plan is null-aware anti") {
    val r = SparkEntry.queries("sql_not_in_null")(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_nulls") > 0L, "fixture lost its NULL rows")
    assert(r.getAs[Long]("n_anti_withnull") === 0L,
      "NOT IN over a list containing NULL must be empty")
    assert(r.getAs[Long]("n_anti_nullfree") > 0L)
    // the with-null IN behaves as a plain semi join (nulls never match)
    assert(r.getAs[Long]("n_semi_withnull") > 0L)
    // plan surface: the single-key NOT IN must plan as a broadcast
    // null-aware anti join (BroadcastHashJoinExec prints its
    // isNullAwareAntiJoin flag as a trailing "true"), not a
    // nested-loop fallback
    val plan = SparkEntry.queries("sql_not_in_null")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti, BuildRight, true"),
      s"no null-aware broadcast anti join in plan:\n$plan")
  }

  test("ds_cogroup_stats: typed cogroup equals the full-outer-join spelling") {
    val cg = SparkEntry.queries("ds_cogroup_stats")(spark, sf)
      .collect().map(_.toString).toSeq
    val T = graft.sources.Tables
    val o = T.t(spark, sf, "orders").groupBy(col("o_custkey").as("k"))
      .agg(count(lit(1)).as("n_orders"), T.sum4(col("o_totalprice")).as("sum_orders"))
    val e = T.t(spark, sf, "events").groupBy(col("user_id").as("k"))
      .agg(count(lit(1)).as("n_events"), T.sum4(col("value")).as("sum_events"))
    val fo = o.join(e, Seq("k"), "full_outer")
      .select(col("k"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("sum_orders"), lit(0.0)).as("sum_orders"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_events"), lit(0.0)).as("sum_events"))
      .orderBy("k")
      .collect().map(_.toString).toSeq
    assert(cg === fo, "cogroup diverges from the relational spelling")
  }

  test("maint_compact_files: file count collapses 64 -> <=8, rows conserved") {
    // run the key once so the staged dirs exist
    val out = SparkEntry.queries("maint_compact_files")(spark, sf)
    val nOut = out.agg(sum("n")).collect()(0).getLong(0)
    val orig = graft.sources.Tables.t(spark, sf, "events").count()
    assert(nOut === orig, "compaction lost or duplicated rows")
    val dir = QRound3.staged(spark, sf, "compactm")(_ => ())
    def parts(p: String): Int =
      new java.io.File(p).listFiles().count(_.getName.startsWith("part-"))
    assert(parts(s"$dir/small") === 64, "small-file stage should have 64 files")
    assert(parts(s"$dir/compact") <= 8,
      "compaction did not collapse the file count")
  }
}
