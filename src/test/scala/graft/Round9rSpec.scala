package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-17 gates (SURVEY §2.28). */
class Round9rSpec extends SparkSpec {

  test("chp_uplift_segments: per-segment contrasts re-derive from counts") {
    val drv = SparkEntry.queries("chp_uplift_segments")(spark, sf).collect()
    assert(drv.nonEmpty)
    drv.foreach { r =>
      val (na, ca, nb, cb) = (r.getAs[Long]("n_a"), r.getAs[Long]("conv_a"),
        r.getAs[Long]("n_b"), r.getAs[Long]("conv_b"))
      assert(na > 0 && nb > 0 && ca <= na && cb <= nb)
      def t6(x: Double) = math.floor(x * 1e6) / 1e6
      assert(r.getAs[Double]("rate_a") === t6(ca.toDouble / na))
      assert(r.getAs[Double]("rate_b") === t6(cb.toDouble / nb))
      assert(r.getAs[Double]("uplift") ===
        t6(cb.toDouble / nb - ca.toDouble / na))
    }
    // arm totals conserve the joined user population
    val users = graft.sources.Tables.t(spark, sf, "events")
      .select("user_id").distinct()
      .join(graft.sources.Tables.t(spark, sf, "customer"),
        col("user_id") === col("c_custkey"))
      .count()
    assert(drv.map(r => r.getAs[Long]("n_a") + r.getAs[Long]("n_b")).sum
      <= users)
  }

  test("text_url_canon_dedup: all four variant spellings collapse to one") {
    import spark.implicits._
    // doc_ids 0..3 share host site0/Site0 and paths p/0..p/3 — plant ids
    // 0, 4·50·7 k + r to force same logical URL across variants:
    // 0, 350, 700, 1050 all have id%7=0, id%50=0, id%4 = 0,2,0,2...
    // instead plant ids with identical (id%7, id%50) and all 4 id%4:
    // lcm(7,50)=350; 350%4 cycles 0,2,0,2 — use explicit crafted ids:
    // id ≡ r (mod 4), id ≡ 0 (mod 350) has solutions id = 350k with
    // 350k % 4 in {0,2} only. So check the canon RULES pairwise instead.
    val docs = Seq(0L, 350L, 700L, 1050L).toDF("doc_id")
    val out = operators.QRound9r.urlCanonDedup(docs).collect()
    // ids 0,350 (variants 0,2), 700,1050 (0,2): same logical URL ->
    // ONE canonical group of 4 docs, 2 distinct raw spellings
    assert(out.length === 1)
    assert(out.head.getAs[String]("canon_url") ===
      "https://site0.example.com/p/0")
    assert(out.head.getAs[Long]("n_docs") === 4L)
    assert(out.head.getAs[Long]("n_variants") === 2L)
    assert(out.head.getAs[Long]("keep_doc") === 0L)
    // port + utm variants also canonicalize to bare form
    val docs2 = Seq(1L, 3L).toDF("doc_id") // variants 1 (:443), 3 (utm)
    val out2 = operators.QRound9r.urlCanonDedup(docs2).collect()
    out2.foreach { r =>
      val u = r.getAs[String]("canon_url")
      assert(!u.contains(":443") && !u.contains("utm") && !u.endsWith("/"), u)
    }
  }

  test("ts_haar_energy: planted series decomposes exactly") {
    import spark.implicits._
    // x = [3, 1, 4, 4, 7, 2, 9] (7 days: 3 L1 pairs + dropped tail)
    val daily = Seq(3L, 1L, 4L, 4L, 7L, 2L, 9L).zipWithIndex
      .map { case (c, d) => ("a", d.toLong, c) }
      .toDF("event_type", "day_num", "cnt")
    val r = operators.QRound9r.haarEnergy(daily).collect().head
    // L1: d = [2, 0, 5], a = [4, 8, 9]; energy1 = 4 + 0 + 25 = 29
    // L2 over a: pair (4,8) -> d = -4; a=9 tail dropped; energy2 = 16
    assert(r.getAs[Long]("n_days") === 7L)
    assert(r.getAs[Long]("n_pairs1") === 3L)
    assert(r.getAs[Long]("energy1") === 29L)
    assert(r.getAs[Long]("n_pairs2") === 1L)
    assert(r.getAs[Long]("energy2") === 16L)
    // driver data: every type present, energies nonnegative
    val drv = SparkEntry.queries("ts_haar_energy")(spark, sf).collect()
    assert(drv.length === 5)
    drv.foreach { row =>
      assert(row.getAs[Long]("energy1") >= 0L)
      assert(row.getAs[Long]("n_pairs2") <= row.getAs[Long]("n_pairs1") / 2 + 1)
    }
  }
}
