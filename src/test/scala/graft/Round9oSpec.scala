package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Round-9 wave-14 gates (SURVEY §2.27). */
class Round9oSpec extends SparkSpec {

  test("mm_laplacian_var: flat image scores 0, checkerboard scores high") {
    import spark.implicits._
    def ppm(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val plane = new Array[Byte](w * h * 3)
      for (r <- 0 until h; c <- 0 until w; ch <- 0 until 3)
        plane((r * w + c) * 3 + ch) = px(r, c).toByte
      header ++ plane
    }
    val flat = ppm(4, 4, (_, _) => 128)
    val checker = ppm(4, 4, (r, c) => if ((r + c) % 2 == 0) 255 else 0)
    val media = Seq(
      operators.Multimodal.MediaRow(1L, flat, "ppm"),
      operators.Multimodal.MediaRow(2L, checker, "ppm")).toDS()
    val out = operators.QRound9o.laplacianVar(media).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Double]("lap_var"), r.getAs[Int]("is_blurry"))).toMap
    assert(out(1L) === ((0.0, 1)))
    // checkerboard interior: |L| = 4*255 everywhere, variance 0 BUT the
    // values alternate sign => E[L]=0, var = (4*255)^2
    assert(out(2L)._1 === math.pow(4 * 255, 2))
    assert(out(2L)._2 === 0)
    // driver data: variance nonnegative, flag matches the cut
    val drv = SparkEntry.queries("mm_laplacian_var")(spark, sf).collect()
    assert(drv.nonEmpty)
    drv.foreach { r =>
      assert(r.getAs[Double]("lap_var") >= 0.0)
      val expect = if (r.getAs[Double]("lap_var") < 4e4) 1 else 0
      assert(r.getAs[Int]("is_blurry") === expect)
    }
  }

  test("win_running_median: the prefix medians are exact") {
    import spark.implicits._
    def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val ev = Seq(
      (1L, 1L, ts(1), 1.00), (2L, 1L, ts(2), 9.00), (3L, 1L, ts(3), 5.00),
      (4L, 1L, ts(4), 100.00))
      .toDF("event_id", "user_id", "ts", "value")
    val out = operators.QRound9o.runningMedian(ev).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("med2x_cents"))
      .toMap
    // prefixes: [100]->200; [100,900]->1000; [100,500,900]->1000;
    // [100,500,900,10000]->1400 (median (500+900)/2 = 700, x2)
    assert(out === Map(1L -> 200L, 2L -> 1000L, 3L -> 1000L, 4L -> 1400L))
  }

  test("agg_mutual_info: independent planted cells score 0") {
    import spark.implicits._
    // 2 types x 2 buckets, perfectly independent: MI = 0 exactly
    val ev = (for {
      t <- Seq("a", "b"); u <- Seq(0L, 1L); _ <- 1 to 5
    } yield (t, u)).zipWithIndex
      .map { case ((t, u), i) => (i.toLong, u, t) }
      .toDF("event_id", "user_id", "event_type")
    val out = operators.QRound9o.mutualInfo(ev).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_events") === 20L)
    assert(out.head.getAs[Long]("n_cells") === 4L)
    assert(out.head.getAs[Double]("mi_nats") === 0.0)
    // driver data: MI bounded by ln(min(|X|,|Y|))
    val drv = SparkEntry.queries("agg_mutual_info")(spark, sf).collect().head
    val mi = drv.getAs[Double]("mi_nats")
    assert(mi >= 0.0 && mi <= math.log(10.0))
  }

  test("stream_available_now: the triggered drain equals the batch read") {
    val dir = operators.QRound9i.stagedEventsDir(spark, sf)
    val batch = SparkEntry.queries("stream_available_now")(spark, sf)
      .collect().map(_.toString).sorted
    val schema = spark.read.parquet(dir).schema
    val q = operators.QRound9o.availableNowAgg(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(dir))
      .writeStream.format("memory").queryName("avnow")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()
    val streamed = spark.table("avnow").collect().map(_.toString).sorted
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
