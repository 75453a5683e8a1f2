package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Per-round benchmark: times every SparkEntry query at the given sf.
  *
  * Each query is materialized through the `noop` sink (not `count()`):
  * count() lets Catalyst prune every projection, so map-only queries would
  * time as scan+count no-ops. The noop sink forces every declared expression
  * to execute while writing nothing.
  *
  * Output contract: ONE JSON line on stdout as the final line (after
  * spark.stop(), so no shutdown logging can interleave), plus the same JSON
  * persisted to BENCH_LOCAL.json as a parse-proof backup (round 1's driver
  * parse of stdout arrived truncated).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    // Untimed warm-up: session/executor init, codegen compiler, parquet
    // footer caches — so per-query times measure the queries, not startup.
    spark.range(1000).selectExpr("sum(id)").collect()
    try noop("agg_group_q1") catch { case _: Throwable => }
    // A failed query records -1 (visible marker), never a fake elapsed time.
    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val t0 = System.nanoTime()
      val ok = try { noop(name); true } catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // 3-decimal times keep the whole JSON line ~2.5 KB: rounds 1 and 2 both
    // lost the driver-side parse because full-precision doubles pushed the
    // line past the driver's stdout tail window.
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total = results.map(_._2).filter(_ >= 0).sum
    val json = s"""{"metric":"total","value":${f3(total)},"unit":"sec"""" +
      s""","queries":$qs,"errors":[${errs.mkString(",")}],"sf":"$sfDir"}"""
    Files.writeString(Paths.get("BENCH_LOCAL.json"), json + "\n")
    spark.stop()
    // Final line of stdout, post-shutdown: nothing can print after this.
    println(json)
    System.out.flush()
  }
}
