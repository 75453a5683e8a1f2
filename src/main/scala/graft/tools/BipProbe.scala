package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Dev probe: stage timings for graph_bipartite_project at sf0.1. */
object BipProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(10).count()
    val events = graft.sources.Tables.t(spark, d, "events")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    import org.apache.spark.sql.expressions.Window
    for (rep <- 1 to 5) {
      time(s"r$rep-scan-only")(events.select(col("user_id"))
        .write.format("noop").mode("overwrite").save())
      val ui = events
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
        .filter(col("k").isNotNull)
        .distinct()
      time(s"r$rep-scan-parse")(events
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
        .filter(col("k").isNotNull)
        .write.format("noop").mode("overwrite").save())
      time(s"r$rep-ui-distinct")(ui.write.format("noop").mode("overwrite").save())
      val capped = ui
        .withColumn("r", row_number().over(Window.partitionBy("user_id")
          .orderBy(md5(concat_ws(":", col("user_id"), col("k"))), col("k"))))
        .filter(col("r") <= 48)
        .select("user_id", "k")
      time(s"r$rep-capped")(capped.write.format("noop").mode("overwrite").save())
      val a = capped.select(col("user_id"), col("k").as("k1"))
      val b = capped.select(col("user_id"), col("k").as("k2"))
      val full = a.join(b, Seq("user_id"))
        .filter(col("k1") < col("k2"))
        .groupBy("k1", "k2")
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 3L)
        .orderBy(col("w").desc, col("k1"), col("k2"))
      time(s"r$rep-full")(full.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
