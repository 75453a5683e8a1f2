package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-3 gates (SURVEY §2.27). */
class Round9dSpec extends SparkSpec {

  private def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")

  test("join_asof_forward: next click strictly after each purchase") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, ts(1), "click"), (2L, 1L, ts(2), "purchase"),
      (3L, 1L, ts(3), "click"), (4L, 1L, ts(4), "purchase"),
      (5L, 2L, ts(5), "view") // filtered out entirely
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = operators.QRound9d.asofForward(ev).collect()
    assert(out.length === 2)
    val m = out.map(r => r.getAs[Long]("event_id") ->
      Option(r.getAs[java.sql.Timestamp]("next_click_ts"))).toMap
    assert(m(2L).isDefined && m(2L).get.toString.startsWith("2024-01-01 03"))
    assert(m(4L).isEmpty, "last purchase must have no next click")
  }

  test("mm_image_entropy: constant image ~0, driver data bounded by ln 256") {
    val hdr = "P6\n2 2\n255\n".getBytes("US-ASCII")
    val flat = hdr ++ Array.fill[Byte](12)(42)
    val be = operators.Multimodal.byteEntropy(flat).get
    assert(be.n_distinct === 1)
    val h = math.log(be.n_bytes.toDouble) -
      be.s_scaled.toDouble / 1e12 / be.n_bytes
    assert(math.abs(h) < 1e-5, s"constant-image entropy $h not ~0")
    val drv = SparkEntry.queries("mm_image_entropy")(spark, sf).collect()
    assert(drv.length === 500)
    drv.foreach { r =>
      val e = r.getAs[Double]("entropy")
      assert(e >= -1e-5 && e <= math.log(256.0) + 1e-9, s"entropy $e out of range")
    }
  }

  test("graph_jaccard_neighbors: 4-cycle opposite corners score 1.0") {
    import spark.implicits._
    val fwd = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    val edges = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
    val out = operators.QRound9d.jaccardNeighbors(edges).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        (r.getAs[Long]("common"), r.getAs[Double]("jaccard"))).toMap
    assert(out.keySet === Set((0L, 2L), (1L, 3L)))
    out.values.foreach { case (c, j) =>
      assert(c === 2L && j === 1.0, s"expected full overlap, got ($c, $j)")
    }
  }

  test("chp_ab_lift_test: arm conservation and statistic re-derivation") {
    val out = SparkEntry.queries("chp_ab_lift_test")(spark, sf).collect()
    assert(out.length === 1)
    val r = out.head
    val (na, ca) = (r.getAs[Long]("n_a"), r.getAs[Long]("conv_a"))
    val (nb, cb) = (r.getAs[Long]("n_b"), r.getAs[Long]("conv_b"))
    val users = graft.sources.Tables.t(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(na + nb === users, "arms do not partition the user base")
    assert(ca <= na && cb <= nb)
    val pa = ca.toDouble / na; val pb = cb.toDouble / nb
    val pp = (ca + cb).toDouble / (na + nb)
    def t6(x: Double) = math.floor(x * 1e6) / 1e6
    def t4(x: Double) = math.floor(x * 1e4) / 1e4
    assert(r.getAs[Double]("rate_a") === t6(pa))
    assert(r.getAs[Double]("rate_b") === t6(pb))
    assert(r.getAs[Double]("lift") === t6(pb - pa))
    val z = (pb - pa) / math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))
    assert(r.getAs[Double]("z_stat") === t4(z))
  }

  test("pipeline_shard_assign: conservation, bounds, partition determinism") {
    val out = SparkEntry.queries("pipeline_shard_assign")(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum === 500L)
    assert(out.forall { r =>
      val s = r.getAs[Long]("shard"); s >= 0 && s < 8 })
    val shareSum = out.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-2)
    val one = operators.QRound9d.shardAssign(
      graft.sources.Tables.t(spark, sf, "documents").repartition(1)).collect()
    assert(one.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq)
  }
}
