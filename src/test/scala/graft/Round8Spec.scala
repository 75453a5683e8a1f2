package graft

import org.apache.spark.sql.functions._

/** Round-8 gates: MLP churn model (no-oracle key — this IS its
  * correctness gate) and the round's new north-star surfaces. */
class Round8Spec extends SparkSpec {

  // same rationale as Round5Spec: sf0.001 has a 3-user test fold; gate at
  // sf0.01 where the split is 121/29
  private val sfTrain = "/root/testdata/sf0.01"

  test("chp_train_mlp: deterministic — two runs emit the identical row") {
    // drive the BUILD directly: the declared key memoizes its result per
    // session (model-state discipline, r17), so only the underlying fit
    // proves training determinism
    val a = operators.ChurnModel.trainEvalMlp(spark, sfTrain)
      .collect().map(_.toString).toSeq
    val b = operators.ChurnModel.trainEvalMlp(spark, sfTrain)
      .collect().map(_.toString).toSeq
    assert(a === b, "MLP training is not deterministic")
    val c = SparkEntry.queries("chp_train_mlp")(spark, sfTrain)
      .collect().map(_.toString).toSeq
    assert(a === c, "memoized key diverges from the build")
  }

  test("chp_train_mlp: AUC bounded, confusion conserves the test fold") {
    val r = SparkEntry.queries("chp_train_mlp")(spark, sfTrain).collect()(0)
    // train-side AUC proves the network actually LEARNED the label; the
    // 29-row test fold makes test AUC fold noise for a 37-param network,
    // so (like the LR key) it is only range-gated
    val aucTrain = r.getAs[Double]("auc_train")
    assert(aucTrain > 0.7 && aucTrain <= 1.0, s"train AUC out of (0.7, 1]: $aucTrain")
    val aucTest = r.getAs[Double]("auc_test")
    assert(aucTest >= 0.0 && aucTest <= 1.0, s"test AUC out of range: $aucTest")
    val n = Seq("tp", "fp", "tn", "fn").map(r.getAs[Long]).sum
    assert(n === r.getAs[Long]("n_test"),
      s"confusion cells don't conserve n_test: $r")
    assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_test") === 150L)
  }

  test("chp_train_mlp: network shape and weights are nontrivial") {
    val r = SparkEntry.queries("chp_train_mlp")(spark, sfTrain).collect()(0)
    // 4→5→2 dense layers with bias: (4+1)*5 + (5+1)*2 = 37 weights
    assert(r.getAs[Long]("n_weights") === 37L, s"wrong weight count: $r")
    assert(r.getAs[Double]("w_l2") > 1e-6, s"all-zero network: $r")
  }

  test("pipeline_span_dedup: a planted shared passage survives in exactly one document") {
    import spark.implicits._
    // a 20-token passage planted in three docs at DIFFERENT offsets; the
    // cut corpus must keep it only in the lowest doc_id and excise it —
    // with exact token accounting — from the other two
    val passage = (1 to 20).map(i => s"shared$i").mkString(" ")
    def fill(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val docs = Seq(
      (1L, s"${fill("fa", 3)} $passage ${fill("ta", 18)}"),
      (2L, s"${fill("fb", 5)} $passage ${fill("tb", 18)}"),
      (3L, s"$passage ${fill("tc", 18)}"))
      .toDF("doc_id", "text")
    val cut = operators.QRound8
      .spanCut(docs, operators.QRound7.substringSpans(docs))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_cut_tokens"), r.getAs[String]("text_cut"))).toMap
    val survivors = cut.filter(_._2._2.contains(passage)).keys.toSeq
    assert(survivors === Seq(1L),
      s"passage must survive only in doc 1, found in $survivors")
    assert(cut(1L)._1 === 0L, s"canonical doc was cut: ${cut(1L)}")
    assert(cut(2L)._1 === 20L && cut(3L)._1 === 20L,
      s"non-canonical cuts wrong: ${cut(2L)._1}, ${cut(3L)._1}")
    // no fragment of the passage may linger in a cut doc
    assert(!cut(2L)._2.contains("shared") && !cut(3L)._2.contains("shared"),
      "passage fragments survived the cut")
  }

  test("pipeline_span_dedup: overlapping cut intervals from different partners merge") {
    import spark.implicits._
    // doc3 holds a 24-token passage; doc1 shares its first 20 tokens,
    // doc2 its last 20 — doc3's two b-side intervals [0,20) and [4,24)
    // must merge to one 24-token cut, not a double-counted 40
    val x = (1 to 24).map(i => s"x$i")
    def fill(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val docs = Seq(
      (1L, s"${x.take(20).mkString(" ")} ${fill("ta", 16)}"),
      (2L, s"${x.drop(4).mkString(" ")} ${fill("tb", 16)}"),
      (3L, s"${x.mkString(" ")} ${fill("tc", 16)}"))
      .toDF("doc_id", "text")
    val cut = operators.QRound8
      .spanCut(docs, operators.QRound7.substringSpans(docs))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_cut_tokens")).toMap
    assert(cut(3L) === 24L, s"doc3 cut must be the 24-token union: $cut")
    // doc2 also loses its 16-token overlap with doc1 (x5..x20)
    assert(cut(2L) === 16L, s"doc2 cut: $cut")
    assert(cut(1L) === 0L, s"canonical doc1 cut: $cut")
  }
}
