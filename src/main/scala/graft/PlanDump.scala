package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspector: prints the formatted physical plan of each named
  * key at the given sf dir (args: sfDir key...). Dev tool, not a surface. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.head
    args.tail.foreach { k =>
      println(s"===== $k =====")
      println(SparkEntry.queries(k)(spark, d).queryExecution.executedPlan
        .toString.linesIterator.take(60).mkString("\n"))
    }
    spark.stop()
  }
}
