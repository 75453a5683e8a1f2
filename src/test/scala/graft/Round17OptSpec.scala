package graft

import graft.sources.TxnLog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Optimization-round-17 gates.
  *
  * 1. Footer-derived per-file stats (TxnLog.statsLines fast path): the
  *    parquet-footer metadata fold must emit BYTE-IDENTICAL manifest
  *    stats tokens to the Spark aggregate pass it replaces — including
  *    negative values, NULL counts, an all-NULL column, multi-file
  *    appends, and every integral width — and the skipping reader must
  *    prune identically over both layouts.
  */
class Round17OptSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    Seq[(java.lang.Long, java.lang.Integer, java.lang.Short)](
      (-50L, null, null), (-7L, -3, null), (0L, 0, null),
      (3L, 9, null), (12L, null, null), (99L, 1000000, null),
      (100L, -2000000000, null), (8L, 7, null))
      .toDF("k", "v", "an")
      .withColumn("an", col("an").cast(ShortType))
  }

  private def stage(dir: String, footer: Boolean): Unit = {
    spark.conf.set("graft.txnlog.footerStats", footer.toString)
    try {
      TxnLog.appendWithStats(spark, dir, fixture.repartition(2), "k", "v", "an")
      TxnLog.appendWithStats(spark, dir,
        fixture.filter(col("k") > 50).repartition(1), "k", "v", "an")
    } finally spark.conf.set("graft.txnlog.footerStats", "true")
  }

  test("footer stats tokens byte-identical to the scan-pass tokens") {
    val base = graft.Staging.trackedTempDir("graft_r17stats_")
    val dA = s"$base/foot"; val dB = s"$base/scan"
    stage(dA, footer = true)
    stage(dB, footer = false)
    def toks(d: String): Seq[String] = {
      val v = TxnLog.latestVersion(spark, d).get
      // strip the uuid'd path; keep each line's ordered token suffix
      TxnLog.snapshotLines(spark, d, v)
        .map(ln => ln.substring(ln.indexOf('\t') + 1)).sorted
    }
    assert(toks(dA) == toks(dB))
    assert(toks(dA).exists(_.contains("stats:an=::")),
      "all-null column must emit empty min/max")
    assert(toks(dA).exists(_.contains("stats:k=-50:")),
      "negative minimum must survive the footer fold")
    // pruning decisions identical over both layouts; a provably
    // out-of-range probe prunes everything, null pruning keeps only the
    // null-bearing files
    val prunes = Seq(dA, dB).map { d =>
      val (_, k1, t1) = TxnLog.readSkipped(spark, d, "k", 60L, 200L)
      val (_, k2, t2) = TxnLog.readSkipped(spark, d, "k", 1000L, 2000L)
      val (_, k3, t3) = TxnLog.readSkippedNull(spark, d, "v")
      (k1, t1, k2, t2, k3, t3)
    }
    assert(prunes.head == prunes(1))
    assert(prunes.head._3 == 0, "out-of-range probe must open zero files")
    assert(prunes.head._2 == 3 && prunes.head._5 < prunes.head._6)
    val a = TxnLog.read(spark, dA).orderBy("k").collect().toSeq
    val b = TxnLog.read(spark, dB).orderBy("k").collect().toSeq
    assert(a == b)
  }
}
