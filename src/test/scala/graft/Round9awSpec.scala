package graft

/** Round-9 wave-48 gates (SURVEY §2.28). */
class Round9awSpec extends SparkSpec {

  test("text_keyphrase_rake: phrases stop-free, capped, scored sanely") {
    val out = SparkEntry.queries("text_keyphrase_rake")(spark, sf).collect()
    assert(out.length === 15)
    out.foreach { r =>
      val phrase = r.getAs[String]("phrase")
      val words = phrase.split(" ")
      // phrase length matches and respects the 3-token cap
      assert(words.length === r.getAs[Long]("n_words"))
      assert(words.length >= 1 && words.length <= 3)
      // no stopword survives inside a candidate phrase
      assert(!words.exists(w => w == "a" || w == "the"))
      assert(r.getAs[Long]("n_occur") >= 1)
      // RAKE score of an n-word phrase is at least n (deg >= freq)
      assert(r.getAs[Double]("score") >= words.length - 1e-4)
    }
    // ranking is by score descending
    val scores = out.map(_.getAs[Double]("score")).toSeq
    assert(scores === scores.sorted.reverse)
  }

  test("graph_rich_club: phi monotone checks and exact count bounds") {
    val out = SparkEntry.queries("graph_rich_club")(spark, sf).collect()
    assert(out.length === 3)
    val byK = out.sortBy(_.getAs[Long]("k"))
    // higher cutoff => fewer qualifying nodes
    val ns = byK.map(_.getAs[Long]("n_k"))
    assert(ns.toSeq === ns.sortBy(-_).toSeq)
    byK.foreach { r =>
      val nk = r.getAs[Long]("n_k"); val ek = r.getAs[Long]("e_k")
      val phi = r.getAs[Double]("phi")
      if (nk > 1) {
        // density within [0, 1]
        assert(phi >= 0.0 && phi <= 1.0)
        assert(ek <= nk * (nk - 1))
      } else assert(phi === -1.0)
    }
  }

  test("emb_kmeans_elbow: inertia non-increasing in k") {
    val out = SparkEntry.queries("emb_kmeans_elbow")(spark, sf).collect()
    assert(out.length === 3)
    val byK = out.sortBy(_.getAs[Long]("k"))
    assert(byK.map(_.getAs[Long]("k")).toSeq === Seq(4L, 8L, 16L))
    val n = byK.head.getAs[Long]("n")
    assert(byK.forall(_.getAs[Long]("n") === n))
    val d = byK.map(_.getAs[Double]("mean_cos_dist"))
    d.foreach(v => assert(v >= 0.0 && v <= 2.0))
    // more clusters never fit worse (same seed family, nested refinement
    // is not guaranteed exactly, allow a small tolerance)
    assert(d(2) <= d(0) + 5e-3)
  }
}
