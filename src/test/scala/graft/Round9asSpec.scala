package graft

/** Round-9 wave-44 gates (SURVEY §2.28). */
class Round9asSpec extends SparkSpec {

  test("ts_lttb_downsample: k buckets per type, endpoints kept, x in series") {
    val out = SparkEntry.queries("ts_lttb_downsample")(spark, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[String]("event_type")).foreach { case (_, rows) =>
      val byBucket = rows.sortBy(_.getAs[Long]("bucket"))
      // one elected point per bucket, buckets within [0, 24)
      val buckets = byBucket.map(_.getAs[Long]("bucket")).toSeq
      assert(buckets === buckets.distinct)
      assert(buckets.forall(b => b >= 0 && b < 24))
      // endpoints: first bucket keeps x=0, last keeps the series max x
      assert(byBucket.head.getAs[Long]("x") === 0L)
      val xs = rows.map(_.getAs[Long]("x"))
      assert(byBucket.last.getAs[Long]("x") === xs.max)
      // x strictly increases with bucket (downsampling preserves order)
      assert(xs.toSeq.sorted === byBucket.map(_.getAs[Long]("x")).toSeq)
      // every elected count is positive
      assert(rows.forall(_.getAs[Long]("c") > 0))
    }
  }

  test("text_vocab_jsd: divergence bounded by ln 2, shared <= vocab") {
    val out = SparkEntry.queries("text_vocab_jsd")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    val nVocab = r.getAs[Long]("n_vocab")
    val nShared = r.getAs[Long]("n_shared")
    assert(nVocab > 0 && nShared > 0 && nShared <= nVocab)
    assert(r.getAs[Long]("tot_a") > 0 && r.getAs[Long]("tot_b") > 0)
    val nats = r.getAs[Double]("jsd_nats")
    assert(nats >= 0.0 && nats <= 0.6932)
    // two random halves of one corpus must NOT look maximally divergent
    assert(nats < 0.5)
    val bits = r.getAs[Double]("jsd_bits")
    assert(bits >= 0.0 && bits <= 1.0)
    // bits ≈ nats / ln2 up to the two independent trunc4 cuts
    assert(math.abs(bits - nats / 0.6931471805599453) < 2e-4)
  }

  test("mm_audio_clipping: exact counts, crest >= 1, ratio consistent") {
    val out = SparkEntry.queries("mm_audio_clipping")(spark, sf).collect()
    assert(out.length === 500)
    out.foreach { r =>
      val n = r.getAs[Long]("n_samples")
      val peak = r.getAs[Long]("peak")
      val clipped = r.getAs[Long]("n_clipped")
      assert(n >= 64 && n < 128)
      assert(peak > 0 && peak <= 1024)
      assert(clipped >= 0 && clipped <= n)
      // peak >= rms always, so crest >= 1 (up to the trunc4 floor)
      assert(r.getAs[Double]("crest") >= 0.9999)
      val ratio = r.getAs[Double]("clip_ratio")
      assert(math.abs(ratio - math.floor(clipped.toDouble / n * 1e4) / 1e4)
        < 1e-9)
      assert(r.getAs[Double]("rms") > 0.0)
    }
    // the synthetic rails do produce clipped samples somewhere
    assert(out.map(_.getAs[Long]("n_clipped")).sum > 0)
  }
}
