package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Round-9 wave-10 gates (SURVEY §2.27). */
class Round9kSpec extends SparkSpec {

  test("emb_knn_classifier: planted votes elect the mode with label tiebreak") {
    import spark.implicits._
    val knn = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), // labels 7,7,3 -> pred 7
      (2L, 10L), (2L, 12L)) // labels 7,3 -> tie, min label 3 wins
      .toDF("vec_id", "nbr_id")
    val labeled = Seq((1L, 7), (2L, 3), (10L, 7), (11L, 7), (12L, 3))
      .toDF("vec_id", "label")
    val out = operators.QRound9k.knnClassifier(knn, labeled).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("label_pred"), r.getAs[Long]("n_votes"),
          r.getAs[Int]("correct"))).toMap
    assert(out(1L) === ((7, 2L, 1)))
    assert(out(2L) === ((3, 1L, 1)))
    // driver data: one verdict per vector that HAS neighbors (a
    // singleton IVF cell yields none), votes bounded by k=3
    val drv = SparkEntry.queries("emb_knn_classifier")(spark, sf)
    val n = graft.sources.Tables.t(spark, sf, "embeddings").count()
    val cnt = drv.count()
    assert(cnt > 0 && cnt <= n)
    assert(drv.filter(col("n_votes") < 1 || col("n_votes") > 3).count() === 0)
  }

  test("sample_kcenter_coreset: exactly k centers, everyone assigned") {
    val drv = SparkEntry.queries("sample_kcenter_coreset")(spark, sf)
    val rows = drv.collect()
    val centers = rows.filter(_.getAs[Int]("is_center") == 1)
    assert(centers.length === 8, s"expected 8 centers, got ${centers.length}")
    // a center is assigned to itself at (trunc4-floored) similarity ~1
    centers.foreach { r =>
      assert(r.getAs[Long]("center_id") === r.getAs[Long]("vec_id"))
      assert(r.getAs[Double]("sim") >= 0.9999)
    }
    // one assignment per vector, center ids drawn from the center set
    val n = graft.sources.Tables.t(spark, sf, "embeddings").count()
    assert(rows.length.toLong === n)
    val cids = centers.map(_.getAs[Long]("vec_id")).toSet
    rows.foreach(r => assert(cids.contains(r.getAs[Long]("center_id"))))
    // deterministic across reruns (greedy has no RNG)
    val again = SparkEntry.queries("sample_kcenter_coreset")(spark, sf)
      .collect().map(_.toString).sorted
    assert(again === rows.map(_.toString).sorted)
  }

  test("win_time_range_rolling: the 24h frame counts exactly what it should") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      (2L, 1L, Timestamp.valueOf("2024-01-01 12:00:00"), 2.0),
      (3L, 1L, Timestamp.valueOf("2024-01-02 00:00:00"), 4.0), // ev1 exactly 24h back: OUT
      (4L, 1L, Timestamp.valueOf("2024-01-02 11:59:59"), 8.0), // ev2,3 in
      (5L, 2L, Timestamp.valueOf("2024-01-01 00:00:00"), 16.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = operators.QRound9k.timeRangeRolling(ev).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("n_24h"), r.getAs[Long]("cents_24h"))).toMap
    assert(out(1L) === ((1L, 100L)))
    assert(out(2L) === ((2L, 300L)))
    assert(out(3L) === ((2L, 600L))) // ev1 at -24h exactly is outside
    assert(out(4L) === ((3L, 1400L)))
    assert(out(5L) === ((1L, 1600L)))
  }

  test("stream_static_join: readStream x static dim == batch enrichment") {
    val dir = operators.QRound9i.stagedEventsDir(spark, sf)
    val dim = graft.sources.Tables.t(spark, sf, "customer")
    val batch = SparkEntry.queries("stream_static_join")(spark, sf)
      .collect().map(_.toString).sorted
    val schema = spark.read.parquet(dir).schema
    val q = operators.QRound9k.staticJoinAgg(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(dir), dim)
      .writeStream.format("memory").queryName("statjoin")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("statjoin").collect().map(_.toString).sorted
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
