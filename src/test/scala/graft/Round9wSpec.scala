package graft

/** Round-9 wave-22 gates (SURVEY §2.28) — corpus distribution QA. */
class Round9wSpec extends SparkSpec {

  test("profile_ks_twosample: planted disjoint slices hit KS = 1") {
    import spark.implicits._
    // en docs all shorter than every non-en doc -> distributions are
    // fully separated, D = 1 at the en slice's largest value
    val docs = Seq(
      (1L, "en", 10L), (2L, "en", 20L), (3L, "en", 30L),
      (4L, "de", 100L), (5L, "de", 200L))
      .map { case (id, l, n) => (id, "x", l, "s", n) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = operators.QRound9w.ksTwoSample(docs).collect().head
    assert(r.getAs[Long]("n1") === 3L)
    assert(r.getAs[Long]("n2") === 2L)
    assert(r.getAs[Long]("ks_at") === 30L) // all of A seen, none of B
    assert(r.getAs[Long]("d_num") === 6L) // |3*2 - 0*3|
    assert(r.getAs[Double]("ks") === 1.0)
  }

  test("profile_ks_twosample: identical slices hit KS = 0") {
    import spark.implicits._
    // same multiset of lengths in both slices -> F1 == F2 everywhere
    val docs = (1L to 8L).map { i =>
      (i, "x", if (i % 2 == 0) "en" else "fr", "s", ((i + 1) / 2) * 10L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = operators.QRound9w.ksTwoSample(docs).collect().head
    assert(r.getAs[Long]("d_num") === 0L)
    assert(r.getAs[Double]("ks") === 0.0)
  }

  test("profile_chi2_assoc: independent planted table scores chi2 = 0") {
    import spark.implicits._
    // 2 langs x 2 buckets with o = r*c/N exactly (perfect independence):
    // en gets 2 docs in each bucket, de gets 1 doc in each bucket
    val rows = Seq.fill(2)(("en", 10L)) ++ Seq.fill(2)(("en", 200L)) ++
      Seq(("de", 10L), ("de", 200L))
    val docs = rows.zipWithIndex.map { case ((l, n), i) =>
      (i.toLong, "x", l, "s", n)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = operators.QRound9w.chi2Assoc(docs).collect().head
    assert(r.getAs[Long]("n_docs") === 6L)
    assert(r.getAs[Long]("r_levels") === 2L)
    assert(r.getAs[Long]("c_levels") === 2L)
    assert(r.getAs[Long]("df") === 1L)
    assert(r.getAs[Double]("chi2") === 0.0)
    assert(r.getAs[Double]("cramers_v") === 0.0)
  }

  test("profile_gini_concentration: balanced = 0, one-hot = (n-1)/n") {
    import spark.implicits._
    def docsOf(masses: Seq[(String, Long)]) =
      masses.zipWithIndex.map { case ((s, n), i) =>
        (i.toLong, "x", "en", s, n)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val eq = operators.QRound9w
      .giniConcentration(docsOf(Seq("a" -> 50L, "b" -> 50L, "c" -> 50L, "d" -> 50L)))
      .collect().head
    assert(eq.getAs[Double]("gini") === 0.0)
    assert(eq.getAs[Double]("top_share") === 0.25)
    // all mass on one of 4 sources: G = Sum|xi-xj| / (2 n X) = (n-1)/n
    val hot = operators.QRound9w
      .giniConcentration(docsOf(Seq("a" -> 120L, "b" -> 0L, "c" -> 0L, "d" -> 0L)))
      .collect().head
    assert(hot.getAs[Double]("gini") === 0.75)
    assert(hot.getAs[Double]("top_share") === 1.0)
  }

  test("wave-22 keys are registered with oracles and run on driver data") {
    val keys = Seq("profile_ks_twosample", "profile_chi2_assoc",
      "profile_gini_concentration")
    keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"$k not registered")
      assert(SparkEntry.oracleSql.contains(k), s"$k has no oracle")
      val rows = SparkEntry.queries(k)(spark, sf).collect()
      assert(rows.length === 1, s"$k: expected one summary row")
    }
  }
}
