package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

/** Round-3 operator invariants the DuckDB oracle cannot (or should not)
  * express: banding recall vs brute force, rewrite-equivalence of the
  * salted join and two-phase distinct, upsert effect size, and the
  * stream-stream join's streaming/batch equivalence. */
class Round3Spec extends SparkSpec {

  test("simhash banding: exact recall vs brute-force all-pairs truth") {
    val banded = SparkEntry.queries("dedup_simhash_pairs")(spark, sf)
      .select("a_id", "b_id", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sh = graft.operators.QRound3.simhashTable(spark, sf)
    val brute = sh.as("a").join(sh.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        expr("CAST(bit_count(a.simhash ^ b.simhash) AS INT)").as("h"))
      .filter(col("h") <= 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded === brute,
      s"banding lost ${(brute -- banded).size} pairs / invented ${(banded -- brute).size}")
    assert(brute.nonEmpty, "degenerate test: no near-dup pairs at all")
  }

  test("simhash banding: candidate count << N^2/2") {
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    val candidates =
      graft.operators.QRound3.simhashCandidates(spark, sf).count()
    assert(candidates < nDocs * (nDocs - 1) / 2 / 10,
      s"candidates $candidates not << all-pairs ${nDocs * (nDocs - 1) / 2}")
  }

  test("lang detect is discriminating (argmax varies across docs)") {
    val langs = SparkEntry.queries("text_lang_detect")(spark, sf)
      .select("pred_lang").distinct().count()
    assert(langs >= 2, s"only $langs predicted class(es) — non-discriminating")
  }

  test("salted join == plain unsalted join") {
    val ev = graft.sources.Tables.t(spark, sf, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_id"))
    val plain = p.join(c, Seq("user_id"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"), min(col("c_id")).as("first_click"))
      .orderBy("user_id").collect()
    val salted = SparkEntry.queries("join_skew_salted")(spark, sf).collect()
    assert(salted.toSeq === plain.toSeq)
  }

  test("two-phase distinct == direct countDistinct") {
    val ev = graft.sources.Tables.t(spark, sf, "events")
    val direct = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type").collect()
    val rewritten =
      SparkEntry.queries("agg_distinct_rewrite")(spark, sf).collect()
    assert(rewritten.toSeq === direct.toSeq)
  }

  test("upsert: restated 10% slice takes effect, row count unchanged") {
    val ev = graft.sources.Tables.t(spark, sf, "events")
    val base = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n")).orderBy("event_type")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val up = SparkEntry.queries("upsert_latest")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // latest-wins: same cardinality as the base table (replace, not append)
    up.foreach { case (et, n, _) => assert(n === base(et), s"$et cardinality") }
    // restated values are strictly larger than the un-restated sum
    val baseSum = ev.groupBy("event_type")
      .agg(graft.sources.Tables.sum4(col("value")).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    up.foreach { case (et, _, s) =>
      assert(s > baseSum(et), s"$et: restatement had no effect")
    }
  }

  test("merged daily HLL sketches land within 2% of exact distinct counts") {
    val approx = SparkEntry.queries("agg_sketch_union")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.sources.Tables.t(spark, sf, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex).toDouble / ex <= 0.02,
        s"$k: ${approx(k)} vs $ex")
    }
  }

  test("ANN recall query: every query vector recalls itself, recall in (0,1]") {
    val rows = SparkEntry.queries("sim_ann_recall")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length === 20)
    rows.foreach { case (qid, hits, recall) =>
      assert(hits >= 1 && hits <= 10, s"qid $qid hits $hits")
      assert(recall > 0.0 && recall <= 1.0, s"qid $qid recall $recall")
    }
  }

  test("custom AsofLookupExec == window-trick as-of spelling") {
    val viaExec = SparkEntry.queries("join_asof_custom")(spark, sf).collect()
    val viaWindow = SparkEntry.queries("join_asof")(spark, sf).collect()
    assert(viaExec.toSeq === viaWindow.toSeq)
    assert(viaExec.nonEmpty)
  }

  test("bucketed tables co-locate the join: no Exchange in the plan") {
    val tbl = graft.sources.Tables.t(spark, sf, _: String)
    tbl("orders").write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("orders_b")
    tbl("customer").write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("customer_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("orders_b").join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed join still shuffles:\n$p")
      val plain = tbl("orders").join(tbl("customer"),
        col("o_custkey") === col("c_custkey")).count()
      assert(j.count() === plain)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("transformWithState running count: state persists across micro-batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    def ev(id: Long, t: String, user: Long): Ev =
      Ev(id, Timestamp.valueOf(t), user, "purchase", 1.0, "{}")
    val ms = MemoryStream[Ev]
    val q = graft.streaming.TwsRunning.runningPurchaseCount(ms.toDF())
      .writeStream.format("memory").queryName("tws")
      .outputMode("append").start()
    ms.addData(ev(1, "2024-01-01 10:00:00", 7), ev(2, "2024-01-01 10:05:00", 7))
    q.processAllAvailable()
    // second micro-batch: the counter must continue from state (3, 4), and
    // a new user starts at 1
    ms.addData(ev(3, "2024-01-01 10:10:00", 7), ev(4, "2024-01-01 10:15:00", 7),
      ev(5, "2024-01-01 10:20:00", 9))
    q.processAllAvailable(); q.stop()
    val got = spark.table("tws").orderBy("user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq === Seq((7L, 1L), (7L, 2L), (7L, 3L), (7L, 4L), (9L, 1L)))
  }

  test("foreachBatch incremental upsert == batch latest-wins merge") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_").toString
    def ev(id: Long, t: String, v: Double): Ev =
      Ev(id, Timestamp.valueOf(t), 1L, "purchase", v, "{}")
    val ms = MemoryStream[Ev]
    // foreachBatch: merge each micro-batch into the parquet state with
    // latest-wins on event_id (the streaming sink side of upsert_latest)
    val q = ms.toDF().writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val cur = try spark.read.parquet(s"$dir/state") catch {
          case _: Throwable => batch.limit(0)
        }
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_id").orderBy(col("ts").desc)
        cur.unionByName(batch)
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .drop("rn")
          .write.mode("overwrite").parquet(s"$dir/next")
        spark.read.parquet(s"$dir/next")
          .write.mode("overwrite").parquet(s"$dir/state")
        ()
    }.start()
    ms.addData(ev(1, "2024-01-01 10:00:00", 5.0), ev(2, "2024-01-01 10:01:00", 7.0))
    q.processAllAvailable()
    // second batch restates event 1 with a later ts and adds event 3
    ms.addData(ev(1, "2024-01-01 11:00:00", 50.0), ev(3, "2024-01-01 11:01:00", 9.0))
    q.processAllAvailable(); q.stop()
    val got = spark.read.parquet(s"$dir/state")
      .select("event_id", "value").orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq === Seq((1L, 50.0), (2L, 7.0), (3L, 9.0)))
  }

  test("left-outer stream-stream join emits the null side after watermark") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    def ev(id: Long, t: String, typ: String, user: Long): Ev =
      Ev(id, Timestamp.valueOf(t), user, typ, 1.0, "{}")
    val msP = MemoryStream[Ev]; val msC = MemoryStream[Ev]
    val q = StreamOps
      .clickPurchaseLeftJoin(msP.toDF(), msC.toDF(), watermarked = true)
      .writeStream.format("memory").queryName("sslj")
      .outputMode("append").start()
    // user 7's purchase has a click in-window; user 9's has none
    msP.addData(ev(10, "2024-01-01 10:45:00", "purchase", 7),
      ev(11, "2024-01-01 10:50:00", "purchase", 9))
    msC.addData(ev(1, "2024-01-01 10:40:00", "click", 7))
    q.processAllAvailable()
    // null-side rows can't emit until the watermark passes the join window:
    // advance both watermarks far beyond it
    msP.addData(ev(90, "2024-01-01 20:00:00", "purchase", 99))
    msC.addData(ev(91, "2024-01-01 20:00:00", "click", 99))
    q.processAllAvailable(); q.stop()
    val got = spark.table("sslj")
      .filter(col("p_id").isin(10L, 11L)).orderBy("p_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(got.toSeq === Seq((10L, 1L), (11L, -1L)),
      "matched purchase joins its click; unmatched purchase emits null side")
  }

  test("stream-stream interval join: two MemoryStreams == batch") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    def ev(id: Long, t: String, typ: String, user: Long): Ev =
      Ev(id, Timestamp.valueOf(t), user, typ, 1.0, "{}")
    val clicks = Seq(
      ev(1, "2024-01-01 10:00:00", "click", 7),
      ev(2, "2024-01-01 10:40:00", "click", 7),
      ev(3, "2024-01-01 08:00:00", "click", 7), // > 1h before: excluded
      ev(4, "2024-01-01 10:30:00", "click", 9)) // other user: excluded
    val purchases = Seq(
      ev(10, "2024-01-01 10:45:00", "purchase", 7),
      ev(11, "2024-01-01 12:00:00", "purchase", 7)) // no clicks in window
    val msP = MemoryStream[Ev]; val msC = MemoryStream[Ev]
    msP.addData(purchases); msC.addData(clicks)
    val q = StreamOps
      .clickPurchaseJoin(msP.toDF(), msC.toDF(), watermarked = true)
      .writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ssj").orderBy("p_id", "c_id").collect()
    val batch = StreamOps.clickPurchaseJoin(
        (purchases ++ clicks).toDF(), (purchases ++ clicks).toDF(),
        watermarked = false)
      .orderBy("p_id", "c_id").collect()
    assert(streamed.toSeq === batch.toSeq)
    assert(streamed.map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((10L, 1L), (10L, 2L)))
  }
}
