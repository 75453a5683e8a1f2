package graft

import org.apache.spark.sql.functions._

/** Gates for the round-7 wave (QRound7): the IVF-PQ composition must
  * actually find neighbors — quantization error must not destroy the
  * ranking on data with metric structure. */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  /** Clustered synthetic embeddings (OperatorSpec.planted twin): this
    * testdata's real embeddings are near-random, so quality gates run on
    * planted clusters, where real corpora live. */
  private def planted(nCenters: Int, n: Int, dim: Int,
      noise: Double): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(nCenters, dim)(rnd.nextDouble() + 0.5)
    (0 until n).map { i =>
      val c = centers(i % nCenters)
      (i.toLong, c.map(x => x + (rnd.nextDouble() - 0.5) * noise).toSeq)
    }
  }

  test("IVF-PQ: recall@10 >= 0.8 vs exact brute force on clustered data") {
    graft.plans.CosineSim.register(spark)
    graft.functions.VecCentroid.register(spark)
    // 64-dim so the 4x16 subspace split applies unchanged
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_").toString
    planted(8, 300, 64, 0.15)
      .map { case (id, v) => (id, v.map(_.toFloat), (id % 8).toInt) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(2)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("sim_ann_ivfpq")(spark, dir)
    val recalls = out.select("qid", "recall").distinct()
      .as[(Long, Double)].collect().toMap
    assert(recalls.size === 20, s"expected 20 query vectors, got ${recalls.size}")
    val mean = recalls.values.sum / recalls.size
    assert(mean >= 0.8, s"mean ADC recall@10 $mean < 0.8")
    // shape: exactly top-10 per query, ranks 1..10, scores non-increasing
    val byQ = out.select("qid", "rnk", "adc_score")
      .as[(Long, Int, Double)].collect().groupBy(_._1)
    byQ.foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to 10), s"ranks broken for qid $qid")
      assert(sorted.sliding(2).forall(p => p(0)._3 >= p(1)._3),
        s"ADC scores not non-increasing for qid $qid")
    }
  }

  test("IVF-PQ: recall column agrees with a driver-side exact recompute") {
    // on the real sf tables: recompute exact top-10 driver-side and check
    // the engine's self-reported recall@10 equals the true overlap
    graft.plans.CosineSim.register(spark)
    graft.functions.VecCentroid.register(spark)
    val out = SparkEntry.queries("sim_ann_ivfpq")(spark, sf)
    val ann = out.select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val e = sources.Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), transform(col("embedding"),
        x => x.cast("double")).as("v"))
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("score").desc, col("vec_id"))
    val truth = e.crossJoin(broadcast(q))
      .select(col("qid"), col("vec_id"),
        expr("floor(cosine_sim(qv, v) * 10000) / 10000.0").as("score"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 10)
      .select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val reported = out.select("qid", "recall").distinct()
      .as[(Long, Double)].collect().toMap
    truth.foreach { case (qid, t) =>
      val expect = math.floor(ann(qid).intersect(t).size / 10.0 * 10000) / 10000.0
      assert(reported(qid) === expect,
        s"self-reported recall for qid $qid is ${reported(qid)}, true $expect")
    }
  }
}
