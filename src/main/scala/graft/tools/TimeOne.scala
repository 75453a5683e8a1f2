package graft.tools

import org.apache.spark.sql.SparkSession

/** Time queries from SparkEntry in one warm session (noop sink — same
  * materialization as Bench) + dump the last one's plan.
  * Usage: runMain graft.tools.TimeOne <key>[,key2,...] [sfDir] [--plan] [--reps=N] */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val keys = args(0).split(",").toSeq
    val sfDir = args.drop(1).find(!_.startsWith("--")).getOrElse("/root/testdata/sf0.1")
    val showPlan = args.contains("--plan")
    val reps = args.collectFirst { case a if a.startsWith("--reps=") => a.stripPrefix("--reps=").toInt }.getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session on an unrelated tiny job
    spark.range(10).count()
    def noop(key: String): Unit =
      graft.SparkEntry.queries(key)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    for (key <- keys) {
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        noop(key)
        println(f"RUN$i $key time=${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      if (showPlan)
        graft.SparkEntry.queries(key)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
