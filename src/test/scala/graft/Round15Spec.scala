package graft

import graft.sources.TxnLog

/** Round-15 gates for the ADVICE r14 TxnLog items: the restore-vs-vacuum
  * race (medium — a restore racing a vacuum could publish a head
  * referencing already-deleted parquet) and the `..tmp-*.crc` checksum
  * litter LocalFileSystem leaves behind per publish. Semantics no SQL
  * oracle can see. */
class Round15Spec extends SparkSpec {

  private def freshTable(): String =
    Staging.trackedTempDir("graft_txn15_")

  private def df(lo: Long, hi: Long) = {
    import spark.implicits._
    spark.range(lo, hi, 1, 1).toDF("value")
  }

  private def dataFilesOnDisk(dir: String): Set[String] = {
    val root = new java.io.File(dir, "data")
    if (!root.exists()) Set.empty
    else root.listFiles().filter(_.isDirectory).flatMap { sub =>
      sub.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => s"data/${sub.getName}/${f.getName}")
    }.toSet
  }

  test("restore aborts loudly (no head published) when the resolved " +
    "files were reclaimed underneath it — never a corrupt head") {
    val dir = freshTable()
    TxnLog.overwrite(spark, dir, df(0, 10))  // v1
    TxnLog.overwrite(spark, dir, df(50, 55)) // v2 restates
    // simulate the race's fatal half: v1's manifest is still present
    // (restore resolves it fine) but a concurrent vacuum already
    // reclaimed one of its data files
    val victim = TxnLog.snapshotFiles(spark, dir, 1).head
    assert(new java.io.File(dir, victim).delete(), s"fixture: $victim")
    val e = intercept[IllegalStateException] { TxnLog.restore(spark, dir, 1) }
    assert(e.getMessage.contains("vacuumed concurrently"), e.getMessage)
    // the loud abort published NOTHING: head still v2, fully readable
    assert(TxnLog.latestVersion(spark, dir) === Some(2))
    assert(TxnLog.read(spark, dir).count() === 5L)
  }

  test("vacuum age-gates dropped-manifest data too: a default-grace " +
    "vacuum leaves freshly-superseded files for a racing restore " +
    "(ADVICE r14); grace=0 still reclaims them") {
    val dir = freshTable()
    TxnLog.overwrite(spark, dir, df(0, 10))  // v1
    TxnLog.overwrite(spark, dir, df(50, 55)) // v2 restates — v1 superseded
    val v1Files = TxnLog.snapshotFiles(spark, dir, 1).toSet
    // default grace drops v1's MANIFEST but must not reclaim its young
    // data files — under the old immediate dropped-ref rule a restore
    // that resolved v1 just before this vacuum would publish a head
    // referencing deleted parquet
    val deleted = TxnLog.vacuum(spark, dir, retain = 1)
    assert(deleted === 0, "default-grace vacuum reclaimed young " +
      "dropped-manifest data — the restore race is open")
    assert(v1Files.subsetOf(dataFilesOnDisk(dir)),
      "v1's data files must survive the grace window")
    intercept[Exception] { TxnLog.read(spark, dir, Some(1)).count() }
    // an explicit zero grace reclaims them (the spec/maintenance path)
    Thread.sleep(20)
    assert(TxnLog.vacuum(spark, dir, retain = 1, orphanGraceMs = 0) > 0)
    val referenced = TxnLog.snapshotFiles(spark, dir, 2).toSet
    assert(dataFilesOnDisk(dir) === referenced,
      "unreferenced data survived a grace=0 vacuum")
    assert(TxnLog.read(spark, dir).count() === 5L)
  }

  test("data skipping: stats-pruned reads open only intersecting files, " +
    "stats-less files are always kept, and stats survive checkpoint " +
    "re-listing and restore") {
    val dir = freshTable()
    // four range-disjoint stats appends: values [0,10) [10,20) [20,30) [30,40)
    for (i <- 0 until 4)
      TxnLog.appendWithStats(spark, dir, df(10L * i, 10L * i + 10), "value")
    def probe(lo: Long, hi: Long): (Seq[Long], Int, Int) = {
      val (d0, kept, total) = TxnLog.readSkipped(spark, dir, "value", lo, hi)
      (d0.filter(s"value BETWEEN $lo AND $hi").collect()
        .map(_.getLong(0)).sorted.toSeq, kept, total)
    }
    // a selective probe opens exactly the one intersecting file
    assert(probe(12, 18) === ((12L to 18L).toSeq, 1, 4))
    // a boundary-spanning probe opens both its files
    assert(probe(8, 12) === ((8L to 12L).toSeq, 2, 4))
    // a file written WITHOUT stats is always kept (correct superset)
    TxnLog.append(spark, dir, df(100, 110))
    assert(probe(12, 18) === ((12L to 18L).toSeq, 2, 5))
    // push past the v10 full checkpoint: stats must survive re-listing
    for (i <- 4 until 10)
      TxnLog.appendWithStats(spark, dir, df(10L * i, 10L * i + 10), "value")
    assert(TxnLog.latestVersion(spark, dir) === Some(11))
    assert(TxnLog.commitInfo(spark, dir, 10).get("kind") !== Some("delta"))
    val (_, k1, t1) = TxnLog.readSkipped(spark, dir, "value", 12, 18)
    assert((k1, t1) === ((2, 11)),
      "stats lost through the checkpoint re-list (everything kept)")
    // ...and survive a restore (full lines carried forward)
    TxnLog.restore(spark, dir, 4)
    val (d2, k2, t2) = TxnLog.readSkipped(spark, dir, "value", 12, 18)
    assert((k2, t2) === ((1, 4)))
    assert(d2.filter("value BETWEEN 12 AND 18").count() === 7L)
    // a no-intersection probe reads zero rows without opening stats files
    val (d3, k3, _) = TxnLog.readSkipped(spark, dir, "value", 500, 600)
    assert(k3 === 0)
    assert(d3.count() === 0L)
  }

  test("copy-on-write delete rewrites ONLY stats-intersecting files, " +
    "preserves history and streaming idempotence, keeps NULL/no-stats " +
    "rows safe, and updates stats so skipping stays sharp") {
    val dir = freshTable()
    for (i <- 0 until 4)
      TxnLog.appendWithStats(spark, dir, df(10L * i, 10L * i + 10), "value")
    // a stats-LESS batch commit (streaming sink shape): must be
    // conservatively rewritten but its rows and its batch clock survive
    val vB = TxnLog.appendBatch(spark, dir, df(100, 110), batchId = 3L)
    val before = TxnLog.snapshotFiles(spark, dir, vB).toSet
    val dv = TxnLog.deleteWhere(spark, dir, "value", 12, 27)
    assert(dv === vB + 1)
    assert(TxnLog.commitInfo(spark, dir, dv).get("op") === Some("delete"))
    val after = TxnLog.snapshotFiles(spark, dir, dv).toSet
    // untouched files carried by LINE (identical paths); intersecting +
    // stats-less files rewritten away
    val untouchedBefore = Seq(0, 3).map(i =>
      TxnLog.listedFiles(spark, dir, i + 1).head).toSet
    assert(untouchedBefore.subsetOf(after),
      "non-intersecting stats files must not be rewritten")
    val touchedBefore = Seq(1, 2).map(i =>
      TxnLog.listedFiles(spark, dir, i + 1).head).toSet
    assert(touchedBefore.intersect(after).isEmpty,
      "intersecting files must be rewritten out of the head")
    // exact row set: [0,12) ∪ (27,40) ∪ the stats-less batch rows
    val vals = TxnLog.read(spark, dir).collect().map(_.getLong(0)).sorted
    assert(vals === ((0L to 11L) ++ (28L to 39L) ++ (100L to 109L)).sorted)
    // history never rewritten
    assert(TxnLog.read(spark, dir, Some(vB)).count() === 50L)
    // batch high-water carried through the delete: id 3 still skips
    assert(TxnLog.appendBatch(spark, dir, df(100, 110), batchId = 3L) === vB)
    assert(TxnLog.read(spark, dir).count() === 34L, "replay double-applied")
    // rewritten remainders re-stats'd: a probe inside the deleted range
    // finds zero rows, opening at most the rewritten files
    val (d1, k1, _) = TxnLog.readSkipped(spark, dir, "value", 12, 27)
    assert(d1.filter("value BETWEEN 12 AND 27").count() === 0L)
    assert(k1 <= 3, s"stale stats kept $k1 files for an emptied range")
    // provable no-op: nothing intersects → no commit published
    assert(TxnLog.deleteWhere(spark, dir, "value", 500, 600) === dv)
    assert(TxnLog.latestVersion(spark, dir) === Some(dv))
  }

  test("copy-on-write merge updates matched keys, inserts new ones, " +
    "rewrites only key-range-intersecting files, and carries history + " +
    "idempotence") {
    import spark.implicits._
    val dir = freshTable()
    for (i <- 0 until 4)
      TxnLog.appendWithStats(spark, dir, df(10L * i, 10L * i + 10), "value")
    val vB = TxnLog.appendBatch(spark, dir,
      spark.range(100, 105, 1, 1).toDF("value"), batchId = 9L) // stats-less
    // source: update keys 12..15 (values exist) + insert 16? exists too —
    // keys here ARE the values; build a 2-col table to tell them apart
    val dir2 = Staging.trackedTempDir("graft_txn15m_")
    def kv(pairs: (Long, Long)*) = pairs.toDF("k", "v")
    // coalesce(1): one file per slice, as the file-carry assertions below
    // assume (fixture latency bug found in OPTIMIZATION r16 — a local Seq
    // toDF writes leafNodeDefaultParallelism=4 part files, 3 of the 4
    // k∈[10,20) parts intersect the source range, and the `.head` carry
    // assertion then depended on directory-listing order: ~75% pass odds
    // per run. Round16Spec's twin fixture already coalesced.)
    for (i <- 0 until 4)
      TxnLog.appendWithStats(spark, dir2,
        (10L * i until 10L * i + 10).map(k => (k, k)).toDF("k", "v")
          .coalesce(1), "k")
    val before = TxnLog.snapshotFiles(spark, dir2, 4).toSet
    // updates: k=12,13 get v=-1; inserts: k=15999,16001 (outside any file)
    val mv = TxnLog.mergeInto(spark, dir2,
      kv(12L -> -1L, 13L -> -1L, 15999L -> 7L, 16001L -> 7L), "k")
    assert(mv === 5)
    assert(TxnLog.commitInfo(spark, dir2, 5).get("op") === Some("merge"))
    val after = TxnLog.snapshotFiles(spark, dir2, 5).toSet
    // source keys span [12, 16001] → files [10,20) [20,30) [30,40)
    // intersect and rewrite; [0,10) carries by line
    val f1 = TxnLog.listedFiles(spark, dir2, 1).head
    assert(after.contains(f1), "non-intersecting file must carry by line")
    assert(!after.contains(TxnLog.listedFiles(spark, dir2, 2).head),
      "intersecting file must be rewritten")
    val rows = TxnLog.read(spark, dir2).as[(Long, Long)].collect().toMap
    assert(rows.size === 42)
    assert(rows(12L) === -1L && rows(13L) === -1L, "updates not applied")
    assert(rows(15999L) === 7L && rows(16001L) === 7L, "inserts missing")
    assert(rows(14L) === 14L && rows(5L) === 5L, "unmatched rows damaged")
    // history intact
    assert(TxnLog.read(spark, dir2, Some(4)).as[(Long, Long)]
      .collect().toMap.apply(12L) === 12L)
    // rewritten files re-stats'd: a probe on the inserted island opens
    // only the rewritten files, never the carried [0,10) file
    val (d1, k1, t1) = TxnLog.readSkipped(spark, dir2, "k", 15000, 17000)
    assert(d1.filter("k BETWEEN 15000 AND 17000").count() === 2L)
    assert(k1 < t1, "merge output stats must keep pruning effective")
    // pure-insert merge against keys beyond every file range still lands
    TxnLog.mergeInto(spark, dir2, kv(90000L -> 1L), "k")
    assert(TxnLog.read(spark, dir2).count() === 43L)
    // empty source: provable no-op
    assert(TxnLog.mergeInto(spark, dir2, kv(), "k") ===
      TxnLog.latestVersion(spark, dir2).get)
    // batch high-water carried through a merge on the FIRST table
    TxnLog.mergeInto(spark, dir,
      spark.range(0, 3, 1, 1).toDF("value"), "value")
    assert(TxnLog.appendBatch(spark, dir,
      spark.range(100, 105, 1, 1).toDF("value"), batchId = 9L) === vB)
  }

  test("delete that empties the whole table still publishes a readable " +
    "(empty) head") {
    val dir = freshTable()
    TxnLog.appendWithStats(spark, dir, df(0, 10), "value")
    val dv = TxnLog.deleteWhere(spark, dir, "value", 0, 9)
    assert(dv === 2)
    assert(TxnLog.read(spark, dir).count() === 0L)
    assert(TxnLog.read(spark, dir, Some(1)).count() === 10L)
    // and the table keeps working afterwards
    TxnLog.append(spark, dir, df(50, 55))
    assert(TxnLog.read(spark, dir).count() === 5L)
  }

  test("compact rewrites the head into exactly targetFiles files with " +
    "identical rows, commits forward (history + streaming idempotence " +
    "intact), and vacuum later reclaims the superseded small files") {
    val dir = freshTable()
    // the classic streaming-sink layout: one small file per batch commit
    for (i <- 0 until 5)
      TxnLog.appendBatch(spark, dir, df(10L * i, 10L * i + 10), i.toLong)
    assert(TxnLog.snapshotFiles(spark, dir, 5).size === 5)
    val before = TxnLog.read(spark, dir).collect().map(_.getLong(0)).sorted
    val cv = TxnLog.compact(spark, dir, targetFiles = 2)
    assert(cv === 6)
    assert(TxnLog.snapshotFiles(spark, dir, 6).size === 2,
      "compact must pin the rewritten file count")
    assert(TxnLog.read(spark, dir).collect().map(_.getLong(0)).sorted
      === before, "compact changed the rows")
    assert(TxnLog.commitInfo(spark, dir, 6).get("op") === Some("compact"))
    // forward commit, not a rewrite: pre-compact versions still read
    assert(TxnLog.read(spark, dir, Some(3)).count() === 30L)
    // batch high-waters carried: a replayed id skips to its old version,
    // a new id proceeds on the compacted base
    assert(TxnLog.appendBatch(spark, dir, df(40, 50), 4L) === 5)
    assert(TxnLog.read(spark, dir).count() === 50L, "replay double-applied")
    TxnLog.appendBatch(spark, dir, df(50, 60), 5L) // v7
    assert(TxnLog.read(spark, dir).count() === 60L)
    // the superseded small files are dropped-manifest history: an aged
    // vacuum reclaims all 5 while the compacted head stays whole
    Thread.sleep(20)
    val deleted = TxnLog.vacuum(spark, dir, retain = 2, orphanGraceMs = 0)
    assert(deleted >= 5, s"expected the 5 small files reclaimed, got $deleted")
    assert(TxnLog.read(spark, dir).count() === 60L)
    intercept[Exception] { TxnLog.read(spark, dir, Some(5)).count() }
    // The concurrent-commit window (a commit landing between compact's
    // snapshot read and its publish) is gated in Round16Spec via the
    // beforeCowPublish fault-injection point: appends commute (both
    // commit), non-appends abort loudly.
  }

  test("vacuum sweeps .tmp- litter INCLUDING ..tmp-*.crc checksum " +
    "siblings (ADVICE r14) while live manifests and their crc twins " +
    "survive; a clean log accumulates NO orphan crc per commit") {
    val dir = freshTable()
    for (i <- 1 to 5) TxnLog.append(spark, dir, df(10L * i, 10L * i + 10))
    val log = new java.io.File(dir, "_txnlog")
    // Adjudication of the ADVICE r14 premise: on this FileContext the
    // checksummed rename moves the tmp's crc ALONG (it lands as the
    // retained manifest's legitimate `.0000N.manifest.crc` twin), and a
    // dropped manifest's crc twin is deleted with it by the checksummed
    // FileSystem — so a healthy log holds AT MOST one crc per manifest,
    // no per-commit accumulation. The broadened `contains(".tmp-")`
    // filter is the defense for a CRASHED writer's orphaned staging pair.
    val names0 = log.listFiles().map(_.getName)
    assert(!names0.exists(_.contains(".tmp-")),
      s"healthy publishes must not accumulate tmp litter: ${names0.toSeq}")
    // plant a crashed writer's staging pair (tmp + its crc sibling)
    java.nio.file.Files.write(
      new java.io.File(log, ".tmp-deadbeef").toPath, "x".getBytes)
    java.nio.file.Files.write(
      new java.io.File(log, "..tmp-deadbeef.crc").toPath, "x".getBytes)
    Thread.sleep(20)
    TxnLog.vacuum(spark, dir, retain = 2, orphanGraceMs = 0)
    val names1 = log.listFiles().map(_.getName)
    assert(!names1.exists(_.contains(".tmp-")),
      s"staged litter (or its crc sibling) survived vacuum: ${names1.toSeq}")
    // retained manifests intact and readable
    assert(TxnLog.read(spark, dir, Some(5)).count() === 50L)
    assert(TxnLog.read(spark, dir, Some(4)).count() === 40L)
  }
}
