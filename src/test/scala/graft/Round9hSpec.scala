package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Round-9 wave-7 gates (SURVEY §2.27). */
class Round9hSpec extends SparkSpec {

  test("serve_mget_bucketed: found/missing partition the request set exactly") {
    val out = SparkEntry.queries("serve_mget_bucketed")(spark, sf).collect()
    assert(out.length === 100)
    assert(out.map(_.getAs[Long]("user_id")).toSeq ===
      (1 to 100).map(_ * 2L))
    val store = operators.QRound5.serveTablePersisted(spark, sf)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Double]("score"), r.getAs[Int]("decile"))).toMap
    out.foreach { r =>
      val id = r.getAs[Long]("user_id")
      if (r.getAs[Boolean]("found")) {
        assert(store(id) === ((r.getAs[Double]("score"), r.getAs[Int]("decile"))),
          s"mget row $id disagrees with the store")
      } else {
        assert(!store.contains(id), s"key $id reported missing but exists")
        assert(r.getAs[Double]("score") === -1.0 && r.getAs[Int]("decile") === -1)
      }
    }
  }

  test("ds_typed_funnel: planted click->purchase ordering semantics") {
    import spark.implicits._
    def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val ev = Seq(
      (1L, 1L, ts(1), "click"), (2L, 1L, ts(3), "purchase"), // converts, 2h
      (3L, 2L, ts(1), "purchase"), (4L, 2L, ts(2), "click"), // wrong order
      (5L, 3L, ts(1), "view") // no click at all
    ).toDF("event_id", "user_id", "ts", "event_type")
      .select("user_id", "event_id", "ts", "event_type")
    val out = operators.QRound9h.typedFunnel(ev).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Boolean]("converted"), r.getAs[Long]("us_to_convert"))).toMap
    assert(out(1L) === ((true, 2L * 3600000000L)))
    assert(out(2L) === ((false, -1L)), "purchase before click must not convert")
    assert(out(3L) === ((false, -1L)))
  }

  test("stream_upsert_sink: chunked foreachBatch replay converges to the twin") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val events = graft.sources.Tables.t(spark, sf, "events")
      .select(col("event_id"),
        col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"),
        col("props")).as[Ev].collect().toSeq
    val chunks = events.grouped(math.max(1, events.size / 3 + 1)).toSeq
    val store = new java.util.concurrent.ConcurrentHashMap[Long,
      (Long, Long, String, Double)]()
    val ms = MemoryStream[Ev]
    val q = ms.toDF().writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select(col("user_id"), col("event_id"),
          expr("unix_micros(cast(ts as timestamp))").as("us"),
          col("event_type"), col("value"))
          .collect().foreach { r =>
            val uid = r.getLong(0)
            val cand = (r.getLong(2), r.getLong(1), r.getString(3), r.getDouble(4))
            store.merge(uid, cand, (a, b) =>
              if (b._1 > a._1 || (b._1 == a._1 && b._2 > a._2)) b else a)
          }
      }.start()
    chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    q.stop()
    val twin = SparkEntry.queries("stream_upsert_sink")(spark, sf).collect()
    assert(twin.length === store.size)
    twin.foreach { r =>
      val uid = r.getAs[Long]("user_id")
      val (us, eid, et, v) = store.get(uid)
      assert((us, eid, et, v) === ((r.getAs[Long]("last_us"),
        r.getAs[Long]("last_event_id"), r.getAs[String]("last_type"),
        r.getAs[Double]("last_value"))),
        s"user $uid: replayed store diverges from the batch twin")
    }
  }
}
