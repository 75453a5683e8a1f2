package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway feature-probe harness (dev tool): runs the SQL passed as
  * args(0) on a bare local session and shows the result or the error. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try spark.sql(args(0)).show(20, truncate = false)
    catch { case e: Throwable =>
      // String.valueOf: getMessage is null for many Throwables
      println("SCRATCH ERROR: " + String.valueOf(e).take(300))
    }
    spark.stop()
  }
}
