package graft
import org.apache.spark.sql.SparkSession
object TimeSome {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // --conf k=v args apply session confs before any query runs (A/B tool)
    val (confs, names) = args.partition(_.startsWith("--conf"))
    confs.map(_.stripPrefix("--conf").dropWhile(_ == '=')).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    try SparkEntry.queries("agg_group_q1")(spark, sfDir).write.format("noop").mode("overwrite").save() catch { case _: Throwable => }
    for (name <- names; _ <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"TIMED $name ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    spark.stop()
  }
}
