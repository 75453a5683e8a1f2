package graft.tools

import org.apache.spark.sql.SparkSession

/** Time one query from SparkEntry twice in a warm session + dump its plan.
  * Usage: runMain graft.tools.TimeOne <key> [sfDir] */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session on an unrelated tiny job
    spark.range(10).count()
    val fn = graft.SparkEntry.queries(key)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"RUN$i $key rows=$n time=${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
