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
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val errs = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val total = results.map(_._2).filter(_ >= 0).sum
    def mkJson(qs: Seq[(String, Double)], omitted: Int): String = {
      val m = qs.map { case (k, v) => "\"" + k + "\":" + f3(v) }
        .mkString("{", ",", "}")
      val om = if (omitted > 0)
        s""","queries_omitted":$omitted,"queries_full":"BENCH_LOCAL.json"""" else ""
      s"""{"metric":"total","value":${f3(total)},"unit":"sec"""" +
        s""","queries":$m,"errors":[${errs.mkString(",")}]$om,"sf":"$sfDir"}"""
    }
    // Full per-query map to a committed file: with ~90 queries the complete
    // JSON line is >2.3 KB, but the driver only keeps the LAST 2000 chars of
    // stdout (rounds 1 and 2 both arrived with the line's head cut off and
    // "parsed": null). So the guaranteed-last stdout line is a compact JSON
    // capped well under that window: total + errors + the slowest queries
    // that fit; the full map lives in BENCH_LOCAL.json.
    Files.writeString(Paths.get("BENCH_LOCAL.json"), mkJson(results, 0) + "\n")
    val budget = 1400
    val bySlowest = results.sortBy(-_._2)
    val keep = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    // envelope + omitted-fields slack + the errors array (ADVICE r3: a run
    // with many failures must not push the line past the 2000-char tail)
    var len = 200 + errs.map(_.length + 1).sum
    for ((k, v) <- bySlowest if len + k.length + 12 <= budget) {
      keep += ((k, v)); len += k.length + 12
    }
    val compact = mkJson(keep.toSeq.sortBy(_._1), results.size - keep.size)
    spark.stop()
    // Final line of stdout, post-shutdown: nothing can print after this.
    println(compact)
    System.out.flush()
  }
}
