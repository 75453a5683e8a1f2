package graft.operators

import graft.QueryPack
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-8 wave (SURVEY §2.26) — the remaining north-star tier from
  * VERDICT r7:
  *
  *  - `chp_train_mlp`: feed-forward-NN churn model parity — the
  *    reference's recalled deployed model class was a small dense neural
  *    classifier, not LR (SURVEY Appendix B); MLlib
  *    MultilayerPerceptronClassifier with a fixed explicit init vector,
  *    z-scored features, and the same md5 hash split as the LR keys.
  */
object QRound8 extends QueryPack {

  /** Train + evaluate the MLP churn classifier (ChurnModel.trainEvalMlp):
    * one row with split sizes, AUC, 0.5-threshold confusion matrix, and
    * weight summary (count / L2 / first / last). No oracle (training is
    * not SQL-expressible) — Round8Spec gates two-run determinism, AUC
    * bounds, and confusion conservation, mirroring `chp_train_auc`. */
  private def chpTrainMlp(s: SparkSession, d: String): DataFrame =
    ChurnModel.trainEvalMlp(s, QPipeline.queries("chp_features_label")(s, d))

  val queries: Map[String, QFn] = Map(
    "chp_train_mlp" -> chpTrainMlp _)

  val oracles: Map[String, String] = Map()
}
