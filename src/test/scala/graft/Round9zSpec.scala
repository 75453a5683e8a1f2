package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-25 gates (SURVEY §2.28). */
class Round9zSpec extends SparkSpec {

  test("agg_weighted_median: weight mass moves the median, ties break low") {
    import spark.implicits._
    // flag a: values 1(w=1), 2(w=1), 100(w=10): half of 12 is 6 ->
    // median = 100 (cum 2 < 6 at value 2). Unweighted median would be 2.
    val li = Seq(
      ("a", 0.01, 1L), ("a", 0.02, 1L), ("a", 1.00, 10L),
      ("b", 0.10, 2L), ("b", 0.20, 2L))
      .toDF("l_returnflag", "l_extendedprice", "l_quantity")
    val out = operators.QRound9z.weightedMedian(li).collect()
      .map(r => r.getAs[String]("flag") ->
        (r.getAs[Long]("wmedian_cents"), r.getAs[Long]("totw"))).toMap
    assert(out("a") === ((100L, 12L)))
    // flag b: cum at 10 cents = 2, 2*2 >= 4 -> the LOWER value wins the tie
    assert(out("b") === ((10L, 4L)))
  }

  test("upsert_schema_evolve: delta column surfaces, base rows stay null") {
    val out = SparkEntry.queries("upsert_schema_evolve")(spark, sf).collect()
    val orders = sources.Tables.t(spark, sf, "orders")
    val total = orders.count()
    assert(out.map(_.getAs[Long]("n")).sum === total, "merge lost rows")
    // evolved rows are exactly the delta keys (o_orderkey % 10 == 3)
    val expectEvolved = orders.filter(col("o_orderkey") % 10 === 3)
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getAs[String]("o_orderstatus") -> r.getAs[Long]("count"))
      .toMap
    out.foreach { r =>
      val st = r.getAs[String]("status")
      assert(r.getAs[Long]("n_evolved") === expectEvolved.getOrElse(st, 0L),
        s"evolved count wrong for $st")
      assert(r.getAs[Long]("n_evolved") <= r.getAs[Long]("n"))
    }
  }

  test("mm_audio_pitch: planted periodic tone is recovered exactly") {
    import spark.implicits._
    // centered square wave of period 8: +100 x4, -100 x4, repeated.
    // Mean = 0, so ACF peaks at the true period within [2, 16].
    val samples = Array.tabulate(96)(i =>
      (if ((i / 4) % 2 == 0) 100 else -100).toShort)
    val wav = Multimodal97Helper.wavOf(samples)
    val media = Seq(operators.Multimodal.MediaRow(7L, wav, "wav"))
      .toDS()
    val r = operators.QRound9z.audioPitch(media).collect().head
    assert(r.getAs[Long]("n_samples") === 96L)
    assert(r.getAs[Long]("best_lag") === 8L)
    assert(r.getAs[Long]("r_best") > 0L)
  }

  test("wave-25 keys registered with oracles") {
    Seq("agg_weighted_median", "upsert_schema_evolve", "mm_audio_pitch")
      .foreach { k =>
        assert(SparkEntry.queries.contains(k), s"$k not registered")
        assert(SparkEntry.oracleSql.contains(k), s"$k has no oracle")
      }
  }
}

/** Minimal RIFF/WAVE writer for planted-audio specs (PCM16 mono). */
object Multimodal97Helper {
  def wavOf(samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("ASCII"))
      .put("fmt ".getBytes("ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }
}
