package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-12 gates (SURVEY §2.27). */
class Round9mSpec extends SparkSpec {

  test("sql_unpivot: the SQL clause yields one long row per measure") {
    val drv = SparkEntry.queries("sql_unpivot")(spark, sf).collect()
    val n = graft.sources.Tables.t(spark, sf, "lineitem").count()
    assert(drv.map(_.getAs[String]("metric")).sorted ===
      Array("l_discount", "l_extendedprice", "l_quantity"))
    drv.foreach(r => assert(r.getAs[Long]("n") === n))
    // measures keep their ranges: discount is a rate, quantity a count
    val byM = drv.map(r => r.getAs[String]("metric") -> r).toMap
    assert(byM("l_discount").getAs[Double]("max_v") <= 1.0)
    assert(byM("l_quantity").getAs[Double]("min_v") >= 1.0)
  }

  test("text_pmi_cooccur: a perfect collocation scores ln 2") {
    import spark.implicits._
    val docs = Seq(
      (1L, "xxx yyy"), (2L, "xxx yyy"), (3L, "zzz"), (4L, "zzz"))
      .toDF("doc_id", "text")
    val out = operators.QRound9m.pmiCooccur(docs).collect()
      .map(r => (r.getAs[String]("term_a"), r.getAs[String]("term_b")) -> r)
      .toMap
    val xy = out(("xxx", "yyy"))
    assert(xy.getAs[Long]("df_ab") === 2L)
    // pmi = ln(N*df_ab/(df_a*df_b)) = ln(4*2/(2*2)) = ln 2
    assert(xy.getAs[Double]("pmi") ===
      math.floor(math.log(2.0) * 1e6) / 1e6)
    // never-co-occurring pairs are absent, not -inf
    assert(!out.contains(("xxx", "zzz")) && !out.contains(("yyy", "zzz")))
    // driver data: pair space bounded by vocab choose 2
    val drv = SparkEntry.queries("text_pmi_cooccur")(spark, sf).collect()
    assert(drv.nonEmpty && drv.length <= 20 * 19 / 2)
  }

  test("emb_outlier_score: anti-centroid vector is flagged") {
    import spark.implicits._
    val emb = Seq(
      (1L, 0, Seq(1.0, 0.0)), (2L, 0, Seq(1.0, 0.0)),
      (3L, 0, Seq(-1.0, 0.0)), // pulls centroid to [1/3, 0]; sim = -1
      (4L, 1, Seq(0.0, 1.0)))
      .toDF("vec_id", "label", "v")
    val out = operators.QRound9m.outlierScore(spark, emb).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Double]("sim_centroid"), r.getAs[Int]("is_outlier"))).toMap
    assert(out(1L) === ((1.0, 0)))
    assert(out(2L) === ((1.0, 0)))
    assert(out(3L) === ((-1.0, 1)))
    assert(out(4L) === ((1.0, 0)))
    // driver data: flags match the threshold cut row by row
    val drv = SparkEntry.queries("emb_outlier_score")(spark, sf).collect()
    assert(drv.nonEmpty)
    drv.foreach { r =>
      val expect = if (r.getAs[Double]("sim_centroid") < 0.0) 1 else 0
      assert(r.getAs[Int]("is_outlier") === expect)
    }
  }

  test("graph_harmonic_sampled: a planted chain scores 12+6+4+3") {
    import spark.implicits._
    val sources = Seq(0L).toDF("vec_id")
    val und = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val out = operators.QRound9m.harmonicSampled(sources, edges).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_reached") === 4L) // node 5 is 5 hops out
    assert(out.head.getAs[Long]("harmonic12") === 25L)
    // driver data: 20 sources, scores positive
    val drv = SparkEntry.queries("graph_harmonic_sampled")(spark, sf).collect()
    assert(drv.length <= 20 && drv.nonEmpty)
    drv.foreach(r => assert(r.getAs[Long]("harmonic12") > 0))
  }
}
