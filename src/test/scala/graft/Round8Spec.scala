package graft

import org.apache.spark.sql.functions._

/** Round-8 gates: MLP churn model (no-oracle key — this IS its
  * correctness gate) and the round's new north-star surfaces. */
class Round8Spec extends SparkSpec {

  // same rationale as Round5Spec: sf0.001 has a 3-user test fold; gate at
  // sf0.01 where the split is 121/29
  private val sfTrain = "/root/testdata/sf0.01"

  test("chp_train_mlp: deterministic — two runs emit the identical row") {
    val a = SparkEntry.queries("chp_train_mlp")(spark, sfTrain)
      .collect().map(_.toString).toSeq
    val b = SparkEntry.queries("chp_train_mlp")(spark, sfTrain)
      .collect().map(_.toString).toSeq
    assert(a === b, "MLP training is not deterministic")
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
}
