package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Round-9 wave-8 gates (SURVEY §2.27). */
class Round9iSpec extends SparkSpec {

  test("join_interval_overlap: planted session×campaign overlap is exact") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, Timestamp.valueOf("2024-01-01 00:30:00")),
      (2L, 1L, Timestamp.valueOf("2024-01-01 01:30:00")), // day0 [0:30,1:30]
      (3L, 2L, Timestamp.valueOf("2024-01-03 02:00:00")),
      (4L, 2L, Timestamp.valueOf("2024-01-03 02:30:00")) // between campaigns 1 and 2
    ).toDF("event_id", "user_id", "ts")
    val out = operators.QRound9i.intervalOverlap(ev).collect()
      .map(r => r.getAs[Long]("campaign") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("overlap_us"))).toMap
    // campaign 0 = [day0 00:00, day0 12:00): contains session [0:30, 1:30]
    assert(out(0L) === ((1L, 3600000000L)),
      s"campaign 0 expected 1 session / 1h overlap, got ${out.get(0L)}")
    assert(out.size === 1, s"unexpected campaigns matched: ${out.keySet}")
    // driver data: overlap bounded by sessions x window length
    val drv = SparkEntry.queries("join_interval_overlap")(spark, sf).collect()
    assert(drv.nonEmpty)
    drv.foreach { r =>
      val ov = r.getAs[Long]("overlap_us")
      assert(ov >= 0 && ov <= r.getAs[Long]("n_sessions") * 43200000000L)
    }
  }

  test("win_cumulative_distinct: the running distinct-type curve is exact") {
    import spark.implicits._
    def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val ev = Seq(
      (1L, 1L, ts(1), "a"), (2L, 1L, ts(2), "a"), (3L, 1L, ts(3), "b"),
      (4L, 1L, ts(4), "a"), (5L, 1L, ts(5), "c"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = operators.QRound9i.cumulativeDistinct(ev).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("n_types_seen"))
      .toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 3L))
    // driver data: curve per user is nondecreasing and ends at the
    // user's true distinct-type count
    val drv = SparkEntry.queries("win_cumulative_distinct")(spark, sf)
    val ends = drv.groupBy("user_id").agg(max("n_types_seen").as("m"))
    val truth = graft.sources.Tables.t(spark, sf, "events")
      .groupBy("user_id").agg(countDistinct("event_type").as("t"))
    assert(ends.join(truth, "user_id").filter(col("m") =!= col("t")).count() === 0)
  }

  test("stream_file_source: readStream over the staged dir == batch agg") {
    val dir = operators.QRound9i.stagedEventsDir(spark, sf)
    val schema = spark.read.parquet(dir).schema
    val q = operators.QRound9i.fileSourceAgg(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(dir))
      .writeStream.format("memory").queryName("filesrc")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("filesrc").orderBy("event_type").collect()
    val batch = SparkEntry.queries("stream_file_source")(spark, sf).collect()
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq,
      "file-stream aggregate diverges from the batch read")
  }
}
