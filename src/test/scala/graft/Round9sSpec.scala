package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-18 gates (SURVEY §2.28). */
class Round9sSpec extends SparkSpec {

  test("ts_max_drawdown: planted collapse is measured from its peak") {
    import spark.implicits._
    // series: 5, 9, 4, 7, 2 -> peak 9, worst trough 2, dd 7 on day 4
    val daily = Seq(5L, 9L, 4L, 7L, 2L).zipWithIndex
      .map { case (c, d) => ("a", d.toLong, c) }
      .toDF("event_type", "day_num", "cnt")
    val r = operators.QRound9s.maxDrawdown(daily).collect().head
    assert(r.getAs[Long]("peak_cnt") === 9L)
    assert(r.getAs[Long]("trough_cnt") === 2L)
    assert(r.getAs[Long]("max_drawdown") === 7L)
    assert(r.getAs[Long]("trough_day") === 4L)
    // driver data: drawdown within [0, peak]
    val drv = SparkEntry.queries("ts_max_drawdown")(spark, sf).collect()
    assert(drv.length === 5)
    drv.foreach { row =>
      val (p, dd) = (row.getAs[Long]("peak_cnt"),
        row.getAs[Long]("max_drawdown"))
      assert(dd >= 0 && dd <= p)
    }
  }

  test("mm_audio_zcr: planted alternating-sign stream crosses every step") {
    import spark.implicits._
    def wav(samples: Seq[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000).putInt(16000)
        .putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(buf.putShort)
      buf.array()
    }
    val alt = wav(Seq.tabulate(10)(i => if (i % 2 == 0) 100 else -100)
      .map(_.toShort))
    val flat = wav(Seq.fill(10)(50.toShort))
    val media = Seq(
      operators.Multimodal.MediaRow(1L, alt, "wav"),
      operators.Multimodal.MediaRow(2L, flat, "wav")).toDS()
    val out = operators.QRound9s.audioZcr(media).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n_crossings"), r.getAs[Double]("zcr"))).toMap
    assert(out(1L) === ((9L, 1.0)))
    assert(out(2L) === ((0L, 0.0)))
    // driver data: zcr in [0,1], crossings < samples
    val drv = SparkEntry.queries("mm_audio_zcr")(spark, sf).collect()
    assert(drv.nonEmpty)
    drv.foreach { r =>
      assert(r.getAs[Double]("zcr") >= 0.0 && r.getAs[Double]("zcr") <= 1.0)
      assert(r.getAs[Long]("n_crossings") < r.getAs[Long]("n_samples"))
    }
  }

  test("join_null_safe: NULL keys match each other instead of dropping") {
    val drv = SparkEntry.queries("join_null_safe")(spark, sf).collect()
    val users = graft.sources.Tables.t(spark, sf, "events")
      .select("user_id").distinct().count()
    // EVERY user survives the join - including the NULL group
    assert(drv.length.toLong === users)
    val nullRows = drv.filter(_.isNullAt(1))
    assert(nullRows.nonEmpty, "no NULL-group users planted?")
    // the NULL group's size column counts exactly the NULL-key users
    nullRows.foreach(r =>
      assert(r.getAs[Long]("grp_size") === nullRows.length.toLong))
  }
}
