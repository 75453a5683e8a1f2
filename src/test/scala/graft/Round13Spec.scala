package graft

import graft.sources.TxnLog

/** Round-13 gates: the TxnLog hardening wave (VERDICT r12 #3/#4/#6 +
  * all three ADVICE r12 items) — vacuum-vs-concurrent-writer safety,
  * loud non-monotone batch-id rejection, O(log n) version resolution,
  * variable-width manifest names past 99999, and monotone commit
  * timestamps. Semantics no SQL oracle can see. */
class Round13Spec extends SparkSpec {

  private def freshTable(): String =
    Staging.trackedTempDir("graft_txn13_")

  private def df(lo: Long, hi: Long) = {
    import spark.implicits._
    spark.range(lo, hi, 1, 2).toDF("value")
  }

  /** Hand-write a manifest in the protocol's on-disk format — the specs
    * below need 1,000-version logs and >99999 version numbers without
    * paying 1,000 parquet commits. The format IS the public contract. */
  private def writeManifest(dir: String, v: Int, header: String,
      files: Seq[String]): Unit = {
    val log = new java.io.File(dir, "_txnlog")
    log.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(log, f"$v%05d.manifest").toPath,
      (header + "\n" + files.mkString("\n") + "\n").getBytes("UTF-8"))
  }

  test("vacuum age gate: an in-flight writer's unpublished data dir " +
    "survives a default-grace vacuum (VERDICT r12 #3)") {
    val dir = freshTable()
    TxnLog.append(spark, dir, df(0, 10)) // v1, live
    // an in-flight append: data written, manifest NOT yet published —
    // at this instant the dir is referenced by nothing
    df(10, 20).write.parquet(s"$dir/data/in-flight-commit")
    val dataRoot = new java.io.File(dir, "data")
    assert(dataRoot.listFiles().count(_.isDirectory) === 2)
    val deleted = TxnLog.vacuum(spark, dir, retain = 1)
    assert(deleted === 0, "default-grace vacuum must not reclaim a " +
      "young unreferenced dir — it may be a live writer's commit")
    assert(dataRoot.listFiles().count(_.isDirectory) === 2)
    // the writer now publishes against the current latest; its data is
    // intact and the commit completes as if vacuum never ran
    val files = new java.io.File(s"$dir/data/in-flight-commit")
      .listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => s"data/in-flight-commit/${f.getName}").toSeq
    val base = TxnLog.snapshotFiles(spark, dir, 1)
    writeManifest(dir, 2,
      s"# ts=${System.currentTimeMillis()} op=append", base ++ files)
    assert(TxnLog.read(spark, dir).count() === 20L)
    // once AGED (grace=0), the same dir would be reclaimable were it
    // still unreferenced — but it is referenced now, so it survives
    Thread.sleep(20)
    assert(TxnLog.vacuum(spark, dir, retain = 2, orphanGraceMs = 0) === 0)
    assert(TxnLog.read(spark, dir).count() === 20L)
  }

  test("non-monotone batch id on a complete log throws instead of " +
    "silently acking unwritten rows (VERDICT r12 #4)") {
    val dir = freshTable()
    TxnLog.appendBatch(spark, dir, df(0, 10), batchId = 5L)
    // a genuine replay of a committed id still returns its version
    assert(TxnLog.appendBatch(spark, dir, df(0, 10), batchId = 5L) === 1)
    // id 3 is under the high-water but NO manifest committed it — a
    // second stream or manual backfill recycling ids; must be loud
    val e = intercept[IllegalArgumentException] {
      TxnLog.appendBatch(spark, dir, df(90, 100), batchId = 3L)
    }
    assert(e.getMessage.contains("non-monotone"))
    assert(TxnLog.read(spark, dir).count() === 10L, "no rows leaked")
    // with a VACUUMED prefix the same shape is indistinguishable from a
    // replay whose manifest was dropped — documented fallback: latest
    TxnLog.appendBatch(spark, dir, df(10, 20), batchId = 6L) // v2
    TxnLog.appendBatch(spark, dir, df(20, 30), batchId = 7L) // v3
    Thread.sleep(20)
    TxnLog.vacuum(spark, dir, retain = 1, orphanGraceMs = 0) // drops v1, v2
    assert(TxnLog.appendBatch(spark, dir, df(10, 20), batchId = 6L) === 3)
    assert(TxnLog.read(spark, dir).count() === 30L)
  }

  test("versionAsOf + committedVersionOfBatch resolve a 1,000-version " +
    "log in O(log n) manifest reads (VERDICT r12 #6)") {
    val dir = freshTable()
    // synthetic log: version v committed at ts=1000+v, every 10th a batch
    val n = 1000
    for (v <- 1 to n) {
      val batch = if (v % 10 == 0) s" batchId=${v / 10} batchHigh=${v / 10}"
        else if (v >= 10) s" batchHigh=${v / 10}" else ""
      writeManifest(dir, v, s"# ts=${1000 + v} op=append$batch",
        Seq(s"data/d$v/part-0.parquet"))
    }
    val r0 = TxnLog.manifestReads.get()
    assert(TxnLog.versionAsOf(spark, dir, 1000 + 437) === 437)
    val afterAsOf = TxnLog.manifestReads.get() - r0
    assert(afterAsOf <= 2 * 10 + 4, // ~2 reads per probe, log2(1000)=10
      s"versionAsOf read $afterAsOf manifests on a $n-version log")
    val r1 = TxnLog.manifestReads.get()
    assert(TxnLog.committedVersionOfBatch(spark, dir, 57L) === Some(570))
    assert(TxnLog.committedVersionOfBatch(spark, dir, 1057L) === None)
    val afterBatch = TxnLog.manifestReads.get() - r1
    assert(afterBatch <= 2 * (2 * 10 + 4),
      s"committedVersionOfBatch read $afterBatch manifests")
    // boundary contracts unchanged
    assert(TxnLog.versionAsOf(spark, dir, 1000 + n + 999) === n)
    intercept[IllegalStateException] {
      TxnLog.versionAsOf(spark, dir, 1000) // before the first commit
    }
  }

  test("manifest names stay visible past version 99999 (ADVICE r12 " +
    "medium): six-digit manifests list, read, and append") {
    val dir = freshTable()
    TxnLog.append(spark, dir, df(0, 10)) // v1, real data files
    val base = TxnLog.snapshotFiles(spark, dir, 1)
    // jump the log to v100000 (six digits under %05d) — same file list
    writeManifest(dir, 100000,
      s"# ts=${System.currentTimeMillis()} op=append", base)
    assert(TxnLog.latestVersion(spark, dir) === Some(100000))
    assert(TxnLog.read(spark, dir).count() === 10L)
    // the next append claims 100001 and stays visible
    val v = TxnLog.append(spark, dir, df(10, 25))
    assert(v === 100001)
    assert(TxnLog.latestVersion(spark, dir) === Some(100001))
    assert(TxnLog.read(spark, dir).count() === 25L)
  }

  test("commit timestamps are monotone per table even within one " +
    "millisecond (ADVICE r12 low)") {
    val dir = freshTable()
    TxnLog.append(spark, dir, df(0, 5))
    TxnLog.append(spark, dir, df(5, 10))
    TxnLog.overwrite(spark, dir, df(0, 7))
    TxnLog.append(spark, dir, df(7, 14))
    val ts = (1 to 4).map(v =>
      TxnLog.commitInfo(spark, dir, v)("ts").toLong)
    assert(ts === ts.sorted, s"non-monotone commit ts: $ts")
    assert(ts.distinct.size === 4, s"duplicate commit ts: $ts")
  }
}
