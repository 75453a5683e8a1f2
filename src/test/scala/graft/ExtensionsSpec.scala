package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftExtensions

/** The spark.sql.extensions entry point must inject the same strategy and
  * function surface the per-object register() helpers bind. */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects the asof strategy and all native functions") {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val (hasStrategy, names) = GraftExtensions.probeInjected(classic)
    assert(hasStrategy, "AsofStrategy not injected")
    assert(names === Seq("bigrams", "cosine_sim", "shingles3", "vec_centroid"))
  }

  test("extension-injected builders produce the same plans as register()") {
    // both paths bind the same Expression constructors — evaluate one
    // function through each binding and require identical results
    import spark.implicits._
    graft.plans.CosineSim.register(spark)
    val viaRegister = Seq((Array(1.0f, 2.0f), Array(2.0f, 4.0f))).toDF("a", "b")
      .selectExpr("cosine_sim(a, b) AS c").head.getDouble(0)
    val viaBuilder = {
      val (_, _, builder) = GraftExtensions.functions
        .find(_._1.funcName == "cosine_sim").get
      // bind the EXTENSION's builder under a fresh name and evaluate it
      // end-to-end through the same SQL path
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry
        .createOrReplaceTempFunction("cosine_sim_ext", builder, "scala_udf")
      Seq((Array(1.0f, 2.0f), Array(2.0f, 4.0f))).toDF("a", "b")
        .selectExpr("cosine_sim_ext(a, b) AS c").head.getDouble(0)
    }
    assert(viaRegister === viaBuilder)
    assert(math.abs(viaRegister - 1.0) < 1e-12)
  }
}
