package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Round-9 wave-4 gates (SURVEY §2.27). */
class Round9eSpec extends SparkSpec {

  test("ts_forecast_drift: a perfectly linear series backtests to MAE 0") {
    import spark.implicits._
    val daily = (0 until 5).map(i => ("a", i.toLong, (i + 1).toLong))
      .toDF("event_type", "day_num", "cnt")
    val out = operators.QRound9e.forecastDrift(daily).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_backtests") === 3L)
    assert(out.head.getAs[Double]("mae") === 0.0,
      s"drift method must nail a linear series, got ${out.head.getAs[Double]("mae")}")
    // driver data: MAE positive and finite for every series
    val drv = SparkEntry.queries("ts_forecast_drift")(spark, sf).collect()
    assert(drv.nonEmpty)
    drv.foreach(r => assert(r.getAs[Double]("mae") >= 0.0))
  }

  test("stream_topk_windows: stream (complete) window counts == batch") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val data = Seq(
      Ev(1, Timestamp.valueOf("2024-01-01 01:00:00"), 1, "click", 1.0, "{}"),
      Ev(2, Timestamp.valueOf("2024-01-01 02:00:00"), 1, "click", 1.0, "{}"),
      Ev(3, Timestamp.valueOf("2024-01-01 03:00:00"), 1, "view", 1.0, "{}"),
      Ev(4, Timestamp.valueOf("2024-01-01 07:00:00"), 1, "view", 1.0, "{}"))
    val ms = MemoryStream[Ev]
    ms.addData(data)
    val q = operators.QRound9e.windowCounts(ms.toDF())
      .writeStream.format("memory").queryName("topkw")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("topkw")
      .orderBy("bucket", "event_type").collect()
    val batch = operators.QRound9e.windowCounts(data.toDF())
      .orderBy("bucket", "event_type").collect()
    assert(streamed.toSeq === batch.toSeq)
    // ranked twin: per bucket ranks are 1..min(3, types), counts ordered
    val drv = SparkEntry.queries("stream_topk_windows")(spark, sf).collect()
    drv.groupBy(_.getAs[Long]("bucket")).foreach { case (b, rows) =>
      val rnks = rows.map(_.getAs[Int]("rnk")).sorted
      assert(rnks.toSeq === (1 to rnks.length), s"bucket $b ranks $rnks")
      val ns = rows.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Long]("n"))
      assert(ns.zip(ns.tail).forall { case (a, c) => a >= c },
        s"bucket $b counts not ranked descending")
    }
  }

  test("dedup_cluster_rep: rep is the longest doc, singletons self-map") {
    val out = SparkEntry.queries("dedup_cluster_rep")(spark, sf).collect()
    assert(out.length === 500)
    val chars = graft.sources.Tables.t(spark, sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byCluster = out.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, rows) =>
      val repIds = rows.map(_.getAs[Long]("rep_id")).distinct
      assert(repIds.length === 1, s"cluster $cid has ${repIds.length} reps")
      val rep = repIds.head
      val maxChars = rows.map(r => chars(r.getAs[Long]("doc_id"))).max
      assert(chars(rep) === maxChars, s"cluster $cid rep $rep is not longest")
      if (rows.length == 1)
        assert(rep === rows.head.getAs[Long]("doc_id"), "singleton not self-rep")
    }
    assert(out.count(_.getAs[Boolean]("is_rep")) === byCluster.size)
  }

  test("sample_split_train_eval: conservation, split bounds, ~80/10/10") {
    val out = SparkEntry.queries("sample_split_train_eval")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum === 500L)
    assert(out.forall(r =>
      Set("train", "val", "test")(r.getAs[String]("split"))))
    out.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val shareSum = rows.map(_.getAs[Double]("share")).sum
      assert(math.abs(shareSum - 1.0) < 1e-2, s"$lang shares sum to $shareSum")
      val train = rows.filter(_.getAs[String]("split") == "train")
        .map(_.getAs[Double]("share")).sum
      assert(train > 0.7 && train < 0.9, s"$lang train share $train not ~0.8")
    }
  }
}
