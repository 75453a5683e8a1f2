package graft.tools

import org.apache.spark.sql.SparkSession

/** Bench-shaped diagnostic loop: runs every SparkEntry key cold+warm in the
  * exact Bench order and environment, but emits per-key JVM pressure
  * telemetry — GC time delta per run, used heap after run, unified-memory
  * storage usage and live persistent-RDD count — to root-cause in-suite
  * warm-run anomalies (VERDICT r10 #1: graph_triangle_count 18.1 s warm vs
  * 2.2 s cold INSIDE the 511-key suite, 1.7-2.0 s standalone; the same
  * mechanism previously hit sim_ann_ivfpq and join_interval_bucket). Run
  * with the same SPARK_DRIVER_MEM as Bench to reproduce its heap.
  *
  * Usage: runMain graft.tools.BenchProbe [sfDir] [keyPrefixFilter]
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def heapUsedMb: Long =
      (java.lang.Runtime.getRuntime.totalMemory() -
        java.lang.Runtime.getRuntime.freeMemory()) / (1024 * 1024)
    def storageMb: Long = {
      val ex = spark.sparkContext.statusTracker.getExecutorInfos
      ex.map(i => i.usedOnHeapStorageMemory() + i.usedOffHeapStorageMemory())
        .sum / (1024 * 1024)
    }
    def nRdds: Int = spark.sparkContext.getPersistentRDDs.size
    def noop(name: String): Unit =
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    spark.range(1000).selectExpr("sum(id)").collect()
    try noop("agg_group_q1") catch { case _: Throwable => }
    val keys = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(k => args.length < 2 || k.startsWith(args(1)))
    println("key,cold_s,warm_s,gc_cold_ms,gc_warm_ms,storage_mb,n_rdds,heap_mb")
    for (k <- keys) {
      def run(): (Double, Long) = {
        val g0 = gcMs; val t0 = System.nanoTime()
        try noop(k) catch { case _: Throwable => }
        ((System.nanoTime() - t0) / 1e9, gcMs - g0)
      }
      val (cold, gcC) = run()
      val (warm, gcW) = run()
      println(f"$k,$cold%.3f,$warm%.3f,$gcC,$gcW,$storageMb,$nRdds,$heapUsedMb")
      System.out.flush()
    }
    spark.stop()
  }
}
