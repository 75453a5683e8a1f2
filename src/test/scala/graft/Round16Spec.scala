package graft

import graft.sources.TxnLog
import org.apache.spark.sql.functions.sum

/** Round-16 gates for the VERDICT r15 concurrency + stats asks:
  * conflict-analyzed retry on copy-on-write DML and compact (disjoint
  * concurrent appends commute and both land; overlapping/stats-less
  * appends and non-append commits abort loudly with nothing published),
  * multi-column file stats with null counts, and the ADVICE r15 contract
  * fixes (integral-column validation before write, NULL-key merge
  * rejection). Uses [[TxnLog.beforeCowPublish]] — the fire-once
  * fault-injection point between a rewrite's data write and its first
  * publish attempt — to land a concurrent commit deterministically
  * inside the race window. */
class Round16Spec extends SparkSpec {

  private def freshTable(): String =
    Staging.trackedTempDir("graft_txn16_")

  private def df(lo: Long, hi: Long) = {
    import spark.implicits._
    spark.range(lo, hi, 1, 1).toDF("value")
  }

  test("delete retries automatically past a concurrent RANGE-DISJOINT " +
    "append: both commit, appended file carries by line, totals exact") {
    val dir = freshTable()
    for (i <- 0 until 4)
      TxnLog.appendWithStats(spark, dir, df(10L * i, 10L * i + 10), "value")
    // land a stats'd append of [100, 110) — provably disjoint from the
    // delete range [12, 27] — inside the delete's publish window
    TxnLog.beforeCowPublish = () =>
      { TxnLog.appendWithStats(spark, dir, df(100, 110), "value"); () }
    val dv = TxnLog.deleteWhere(spark, dir, "value", 12, 27)
    // the concurrent append claimed v5; the delete serialized after it
    assert(dv === 6)
    assert(TxnLog.commitInfo(spark, dir, 5).get("op") === Some("append"))
    assert(TxnLog.commitInfo(spark, dir, 6).get("op") === Some("delete"))
    // the winner's file carries by LINE into the delete's head
    val appended = TxnLog.listedFiles(spark, dir, 5).head
    assert(TxnLog.snapshotFiles(spark, dir, 6).contains(appended))
    // exact rows: [0,12) ∪ (27,40) ∪ the concurrent [100,110)
    val vals = TxnLog.read(spark, dir).collect().map(_.getLong(0)).sorted
    assert(vals === ((0L to 11L) ++ (28L to 39L) ++ (100L to 109L)).sorted)
    // and the appended file's stats survived the carry: a probe on its
    // range opens exactly that one file
    val (_, k, t) = TxnLog.readSkipped(spark, dir, "value", 100, 109)
    assert((k, t) === ((1, TxnLog.snapshotFiles(spark, dir, 6).size)))
  }

  test("delete aborts loudly when the concurrent append OVERLAPS the " +
    "predicate range or carries no stats; nothing is published") {
    val dir = freshTable()
    for (i <- 0 until 3)
      TxnLog.appendWithStats(spark, dir, df(10L * i, 10L * i + 10), "value")
    TxnLog.beforeCowPublish = () =>
      { TxnLog.appendWithStats(spark, dir, df(15, 18), "value"); () }
    val e1 = intercept[IllegalStateException] {
      TxnLog.deleteWhere(spark, dir, "value", 12, 27)
    }
    assert(e1.getMessage.contains("overlapping"), e1.getMessage)
    assert(TxnLog.latestVersion(spark, dir) === Some(4)) // only the append
    assert(TxnLog.commitInfo(spark, dir, 4).get("op") === Some("append"))
    // stats-LESS concurrent append: conservatively a conflict
    TxnLog.beforeCowPublish = () =>
      { TxnLog.append(spark, dir, df(500, 505)); () }
    val e2 = intercept[IllegalStateException] {
      TxnLog.deleteWhere(spark, dir, "value", 0, 5)
    }
    assert(e2.getMessage.contains("no value stats"), e2.getMessage)
    // both aborts published nothing: every version is an append, and the
    // rows are exactly the five appends' rows
    val latest = TxnLog.latestVersion(spark, dir).get
    assert((1 to latest).forall(v =>
      TxnLog.commitInfo(spark, dir, v).getOrElse("op", "") == "append"))
    assert(TxnLog.read(spark, dir).count() === 38L) // 30 + 3 + 5
  }

  test("delete aborts loudly when a NON-APPEND commit (overwrite) lands " +
    "concurrently — the file set it read was rewritten") {
    val dir = freshTable()
    TxnLog.appendWithStats(spark, dir, df(0, 10), "value")
    TxnLog.beforeCowPublish = () =>
      { TxnLog.overwrite(spark, dir, df(50, 55)); () }
    val e = intercept[IllegalStateException] {
      TxnLog.deleteWhere(spark, dir, "value", 0, 5)
    }
    assert(e.getMessage.contains("'overwrite'"), e.getMessage)
    assert(TxnLog.latestVersion(spark, dir) === Some(2))
    assert(TxnLog.read(spark, dir).count() === 5L) // the overwrite's rows
  }

  test("merge retries past a disjoint concurrent append and aborts on an " +
    "overlapping one; concurrent batch high-waters survive the retry") {
    import spark.implicits._
    val dir = freshTable()
    for (i <- 0 until 3)
      TxnLog.appendWithStats(spark, dir,
        (10L * i until 10L * i + 10).map(k => (k, k)).toDF("k", "v").coalesce(1), "k")
    // concurrent STREAMING append (disjoint range, own batch clock,
    // stats'd so the conflict analysis can prove disjointness)
    TxnLog.beforeCowPublish = () => {
      TxnLog.appendBatch(spark, dir,
        (100L until 105L).map(k => (k, k)).toDF("k", "v").coalesce(1),
        batchId = 7L, statsCols = Seq("k"))
      ()
    }
    val mv = TxnLog.mergeInto(spark, dir,
      Seq((12L, -1L), (13L, -2L)).toDF("k", "v"), "k")
    assert(mv === 5) // append took v4, merge serialized after it
    val rows = TxnLog.read(spark, dir).as[(Long, Long)].collect().toMap
    assert(rows.size === 35 && rows(12L) === -1L && rows(13L) === -2L)
    assert(rows(100L) === 100L, "concurrent append's rows lost")
    // the winner's batch high-water carried into the merge's head:
    // replaying batch 7 must skip, not double-append
    assert(TxnLog.appendBatch(spark, dir,
      (100L until 105L).map(k => (k, k)).toDF("k", "v").coalesce(1),
      batchId = 7L, statsCols = Seq("k")) === 4)
    assert(TxnLog.read(spark, dir).count() === 35L)
    // overlapping concurrent append → loud abort, nothing published
    TxnLog.beforeCowPublish = () => {
      TxnLog.appendWithStats(spark, dir,
        Seq((13L, 99L)).toDF("k", "v"), "k"); ()
    }
    val e = intercept[IllegalStateException] {
      TxnLog.mergeInto(spark, dir, Seq((13L, -3L)).toDF("k", "v"), "k")
    }
    assert(e.getMessage.contains("overlapping"), e.getMessage)
    assert(TxnLog.commitInfo(spark, dir,
      TxnLog.latestVersion(spark, dir).get).get("op") === Some("append"))
  }

  test("compact commutes with ANY concurrent append: both commit, the " +
    "appended file rides beside the compacted ones, history intact " +
    "(VERDICT r15 missing #4)") {
    val dir = freshTable()
    for (i <- 0 until 5)
      TxnLog.append(spark, dir, df(10L * i, 10L * i + 10))
    TxnLog.beforeCowPublish = () =>
      { TxnLog.append(spark, dir, df(50, 60)); () } // overlap-irrelevant
    val cv = TxnLog.compact(spark, dir, targetFiles = 2)
    assert(cv === 7) // append claimed v6; compact serialized after it
    assert(TxnLog.commitInfo(spark, dir, 6).get("op") === Some("append"))
    assert(TxnLog.commitInfo(spark, dir, 7).get("op") === Some("compact"))
    // head = 2 compacted files + the concurrently appended one
    assert(TxnLog.snapshotFiles(spark, dir, 7).size === 3)
    assert(TxnLog.read(spark, dir).collect().map(_.getLong(0)).sorted
      === (0L until 60L).toArray)
    // pre-compact history still readable
    assert(TxnLog.read(spark, dir, Some(5)).count() === 50L)
  }

  test("multi-column stats prune on EACH dimension and their conjunction; " +
    "delete on either column works and preserves both columns' stats") {
    import spark.implicits._
    val dir = freshTable()
    // 4 files on a 2x2 grid: a in {0x, 1x}, b in {0x, 1x}
    for (ai <- 0 until 2; bi <- 0 until 2)
      TxnLog.appendWithStats(spark, dir,
        (0L until 10L).map(j => (ai * 100L + j, bi * 100L + j))
          .toDF("a", "b").coalesce(1),
        "a", "b")
    def kept(preds: (String, Long, Long)*): Int =
      TxnLog.readSkippedMulti(spark, dir, preds)._2
    assert(kept(("a", 0L, 50L)) === 2)              // one a-row of the grid
    assert(kept(("b", 100L, 150L)) === 2)           // one b-column
    assert(kept(("a", 0L, 50L), ("b", 100L, 150L)) === 1) // one cell
    assert(kept(("a", 0L, 500L)) === 4)             // full range: all kept
    // superset correctness on the conjunction
    val (d1, _, _) = TxnLog.readSkippedMulti(spark, dir,
      Seq(("a", 0L, 50L), ("b", 100L, 150L)))
    assert(d1.filter("a <= 50 AND b >= 100").count() === 10L)
    // delete on the SECOND stats column (any stats'd column works)
    val dv = TxnLog.deleteWhere(spark, dir, "b", 100L, 103L)
    assert(TxnLog.read(spark, dir, Some(dv)).count() === 32L)
    // rewritten remainders re-stats'd on BOTH columns: pruning on a AND
    // on b stays sharp after the rewrite
    val linesAfter = TxnLog.latestVersion(spark, dir).get
    assert(kept(("a", 0L, 50L), ("b", 100L, 150L)) <= 2,
      "rewrite lost multi-column stats sharpness")
    val (d2, k2, _) = TxnLog.readSkippedMulti(spark, dir,
      Seq(("b", 100L, 103L)))
    assert(d2.filter("b BETWEEN 100 AND 103").count() === 0L)
    assert(linesAfter === dv) // delete was the last commit
  }

  test("null-count pruning: an IS NULL probe opens only null-bearing " +
    "files; stats-less files are always kept") {
    import spark.implicits._
    val dir = freshTable()
    // file 1: no nulls; file 2: 3 nulls; file 3: ALL null
    TxnLog.appendWithStats(spark, dir,
      (0L until 10L).map(j => (j, Option(j))).toDF("k", "x").coalesce(1), "x")
    TxnLog.appendWithStats(spark, dir,
      (10L until 20L).map(j => (j, if (j < 13) None else Some(j)))
        .toDF("k", "x").coalesce(1), "x")
    TxnLog.appendWithStats(spark, dir,
      (20L until 25L).map(j => (j, Option.empty[Long])).toDF("k", "x").coalesce(1), "x")
    val (d1, k1, t1) = TxnLog.readSkippedNull(spark, dir, "x")
    assert((k1, t1) === ((2, 3)))
    assert(d1.filter("x IS NULL").count() === 8L)
    // the all-null file is range-UNMATCHABLE: a range probe skips it
    val (_, k2, _) = TxnLog.readSkipped(spark, dir, "x", 20, 24)
    assert(k2 === 0, "all-null file must be provably range-disjoint")
    // a stats-less file is kept by the null probe (unknown null count)
    TxnLog.append(spark, dir, (30L until 32L).map(j => (j, Option(j)))
      .toDF("k", "x").coalesce(1))
    assert(TxnLog.readSkippedNull(spark, dir, "x")._2 === 3)
  }

  test("stats validation happens BEFORE any data file is written: a " +
    "non-integral or missing column fails with a clear message and " +
    "leaves zero litter (ADVICE r15); INT columns work") {
    import spark.implicits._
    val dir = freshTable()
    TxnLog.appendWithStats(spark, dir,
      (0L until 5L).map(j => (j, s"s$j")).toDF("k", "s").coalesce(1), "k")
    def dataDirs(): Int = {
      val root = new java.io.File(dir, "data")
      if (!root.exists()) 0 else root.listFiles().count(_.isDirectory)
    }
    val before = dataDirs()
    val e1 = intercept[IllegalArgumentException] {
      TxnLog.appendWithStats(spark, dir,
        (5L until 9L).map(j => (j, s"s$j")).toDF("k", "s"), "s")
    }
    assert(e1.getMessage.contains("integral"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      TxnLog.appendWithStats(spark, dir,
        (5L until 9L).map(j => (j, s"s$j")).toDF("k", "s"), "nope")
    }
    assert(e2.getMessage.contains("not in schema"), e2.getMessage)
    assert(dataDirs() === before, "failed validation left data litter")
    // an INT (not BIGINT) stats column commits and prunes fine
    TxnLog.appendWithStats(spark, dir,
      (100 until 110).map(j => (j.toLong, "x")).toDF("k", "s")
        .selectExpr("CAST(k AS INT) AS k", "s").coalesce(1), "k")
    val (_, k, t) = TxnLog.readSkipped(spark, dir, "k", 100, 105)
    assert((k, t) === ((1, 2)))
  }

  test("mergeInto rejects NULL source keys loudly (ADVICE r15): NULL " +
    "never equi-matches, so NULL-key rows can neither update nor insert " +
    "idempotently") {
    import spark.implicits._
    val dir = freshTable()
    TxnLog.appendWithStats(spark, dir,
      (0L until 5L).map(j => (j, j)).toDF("k", "v").coalesce(1), "k")
    val e = intercept[IllegalArgumentException] {
      TxnLog.mergeInto(spark, dir,
        Seq((Option.empty[Long], 9L), (Some(1L), 9L)).toDF("k", "v"), "k")
    }
    assert(e.getMessage.contains("NULL k key"), e.getMessage)
    assert(TxnLog.latestVersion(spark, dir) === Some(1)) // nothing published
    // an all-NULL source is the same loud error, not a silent no-op
    intercept[IllegalArgumentException] {
      TxnLog.mergeInto(spark, dir,
        Seq((Option.empty[Long], 9L)).toDF("k", "v"), "k")
    }
  }

  test("partitioned txn table: part tokens prune like stats on both " +
    "dimensions, the partition column restores typed on read, and " +
    "delete/merge/compact preserve the partition layout") {
    import spark.implicits._
    val dir = freshTable()
    // two appends of k-halves, each Hive-partitioned by p = k % 4 with
    // k-stats: 8 files on a (half x p) grid
    for (h <- 0 until 2)
      TxnLog.appendPartitioned(spark, dir,
        (20L * h until 20L * h + 20L).map(k => (k, 10 * k, k % 4))
          .toDF("k", "v", "p").coalesce(1),
        "p", "k")
    val lines = TxnLog.snapshotLines(spark, dir, 2)
    assert(lines.size === 8)
    assert(lines.forall(ln => TxnLog.partTokenOf(ln).exists(_._1 == "p")))
    // the partition column restores from the directory layout, typed
    val r = TxnLog.read(spark, dir)
    assert(r.count() === 40L)
    assert(r.agg(sum("p")).head.getLong(0) === 60L)
    // partition pruning IS stats pruning: p's part token reads as
    // min=max stats, composable with the k-range dimension
    def kept(preds: (String, Long, Long)*): Int =
      TxnLog.readSkippedMulti(spark, dir, preds)._2
    assert(kept(("p", 1L, 1L)) === 2)
    assert(kept(("k", 0L, 19L)) === 4)
    assert(kept(("p", 1L, 1L), ("k", 0L, 19L)) === 1)
    val (d1, _, _) = TxnLog.readSkippedMulti(spark, dir,
      Seq(("p", 1L, 1L), ("k", 0L, 19L)))
    assert(d1.filter("p = 1 AND k <= 19").agg(sum("k")).head.getLong(0)
      === (1L + 5 + 9 + 13 + 17))
    // DELETE keyed on the PARTITION column: touches only p=2 files
    // (whole-partition drop — every row in them matches)
    val dv = TxnLog.deleteWhere(spark, dir, "p", 2L, 2L)
    assert(TxnLog.snapshotFiles(spark, dir, dv).size === 6)
    assert(TxnLog.read(spark, dir).count() === 30L)
    assert(kept(("p", 2L, 2L)) === 0)
    // DELETE keyed on the DATA column: rewrite preserves the partition
    // layout (fresh part tokens, p still restores)
    TxnLog.deleteWhere(spark, dir, "k", 5L, 7L)
    val lines2 = TxnLog.snapshotLines(spark, dir,
      TxnLog.latestVersion(spark, dir).get)
    assert(lines2.forall(ln => TxnLog.partTokenOf(ln).exists(_._1 == "p")),
      "delete rewrite lost the partition layout")
    val r2 = TxnLog.read(spark, dir)
    assert(r2.count() === 28L) // k=5 (p=1) and k=7 (p=3) removed; k=6 was p=2
    assert(r2.filter("p = 1").count() === 9L)
    // MERGE on the key column: update lands, partition layout preserved
    TxnLog.mergeInto(spark, dir,
      Seq((8L, -1L, 0L)).toDF("k", "v", "p"), "k")
    val rows = TxnLog.read(spark, dir).select("k", "v").as[(Long, Long)]
      .collect().toMap
    assert(rows(8L) === -1L && rows.size === 28)
    // COMPACT on a partitioned table: one file per live partition value
    val cv = TxnLog.compact(spark, dir)
    val lines3 = TxnLog.snapshotLines(spark, dir, cv)
    assert(lines3.size === 3) // p in {0, 1, 3} survive
    assert(lines3.flatMap(ln => TxnLog.partTokenOf(ln)).map(_._2).sorted
      === Seq("0", "1", "3"))
    assert(TxnLog.read(spark, dir).count() === 28L)
    assert(TxnLog.read(spark, dir, Some(2)).count() === 40L) // history
    // vacuum's recursive walk reclaims the superseded NESTED files
    Thread.sleep(20)
    val deleted = TxnLog.vacuum(spark, dir, retain = 1, orphanGraceMs = 0)
    assert(deleted > 0, "nested partitioned files were not reclaimed")
    val onDisk = {
      def walk(f: java.io.File): Seq[String] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet"))
          Seq(f.getPath.stripPrefix(dir + "/")) else Nil
      walk(new java.io.File(dir, "data")).toSet
    }
    assert(onDisk === TxnLog.snapshotFiles(spark, dir, cv).toSet,
      "on-disk parquet set must equal the retained head's file set")
    assert(TxnLog.read(spark, dir).count() === 28L)
  }

  test("a delete that empties a partitioned table leaves a readable " +
    "plain head carrying the partition column as data; later " +
    "partitioned appends union back by name") {
    import spark.implicits._
    val dir = freshTable()
    TxnLog.appendPartitioned(spark, dir,
      (0L until 12L).map(k => (k, k % 3)).toDF("k", "p").coalesce(1),
      "p", "k")
    val dv = TxnLog.deleteWhere(spark, dir, "k", 0L, 11L)
    assert(TxnLog.read(spark, dir).count() === 0L)
    assert(TxnLog.read(spark, dir).columns.toSet === Set("k", "p"))
    TxnLog.appendPartitioned(spark, dir,
      (20L until 26L).map(k => (k, k % 3)).toDF("k", "p").coalesce(1),
      "p", "k")
    assert(TxnLog.read(spark, dir).count() === 6L)
    assert(TxnLog.read(spark, dir).agg(sum("p")).head.getLong(0) ===
      (20L until 26L).map(_ % 3).sum)
    assert(TxnLog.read(spark, dir, Some(dv)).count() === 0L)
  }

  test("merge-on-read delete: file list unchanged, rows exact, vectors " +
    "accumulate across deletes, CDC reports the deleted rows, compact " +
    "applies the vectors, vacuum keeps referenced sidecars") {
    val dir = freshTable()
    for (i <- 0 until 4)
      TxnLog.appendWithStats(spark, dir, df(10L * i, 10L * i + 10), "value")
    val before = TxnLog.snapshotFiles(spark, dir, 4).toSet
    val dv1 = TxnLog.deleteWhereMoR(spark, dir, "value", 12, 27)
    assert(dv1 === 5)
    // the headline: NO file was rewritten — same file set, tiny sidecar
    assert(TxnLog.snapshotFiles(spark, dir, 5).toSet === before)
    assert(TxnLog.read(spark, dir).collect().map(_.getLong(0)).sorted
      === ((0L to 11L) ++ (28L to 39L)).toArray)
    assert(TxnLog.read(spark, dir, Some(4)).count() === 40L) // history
    // second overlapping MoR delete: tokens ACCUMULATE, union applies,
    // previously-deleted rows are not re-matched (disjoint sidecars)
    val dv2 = TxnLog.deleteWhereMoR(spark, dir, "value", 0, 13)
    assert(TxnLog.read(spark, dir).collect().map(_.getLong(0)).sorted
      === (28L to 39L).toArray)
    val lines6 = TxnLog.snapshotLines(spark, dir, dv2)
    assert(lines6.exists(ln => TxnLog.dvTokensOf(ln).size === 2),
      "file hit by both deletes must carry both vectors")
    // a provable no-op (everything in range already deleted) publishes
    // nothing
    assert(TxnLog.deleteWhereMoR(spark, dir, "value", 12, 13) === dv2)
    // CDC sees the MoR deletes exactly, even though no file path changed
    val ch = TxnLog.changes(spark, dir, 4, 6)
      .collect().map(r => (r.getAs[Int]("_change_version"),
        r.getAs[String]("_change_type"), r.getLong(0)))
    assert(ch.forall(_._2 == "delete"))
    assert(ch.filter(_._1 == 5).map(_._3).sorted === (12L to 27L).toArray)
    assert(ch.filter(_._1 == 6).map(_._3).sorted === (0L to 11L).toArray)
    // stats pruning still works (stale-wide is superset-correct)
    val (d1, k1, _) = TxnLog.readSkipped(spark, dir, "value", 12, 18)
    assert(d1.filter("value BETWEEN 12 AND 18").count() === 0L)
    assert(k1 >= 1)
    // compact APPLIES the vectors: clean files, tokens gone, rows same
    val cv = TxnLog.compact(spark, dir, targetFiles = 2)
    val lines7 = TxnLog.snapshotLines(spark, dir, cv)
    assert(lines7.size === 2 && lines7.forall(ln =>
      TxnLog.dvTokensOf(ln).isEmpty))
    assert(TxnLog.read(spark, dir).collect().map(_.getLong(0)).sorted
      === (28L to 39L).toArray)
    // ...and the compact is CDC-invisible (same rows on both sides)
    assert(TxnLog.changes(spark, dir, 6, 7).count() === 0L)
    // pre-compact DV version still reads exactly (sidecars retained)
    assert(TxnLog.read(spark, dir, Some(6)).count() === 12L)
    // vacuum: while a manifest referencing the vectors is retained, the
    // sidecars survive; once only the compacted head remains, data AND
    // sidecars reclaim, and the on-disk set equals the head's files
    Thread.sleep(20)
    TxnLog.vacuum(spark, dir, retain = 3, orphanGraceMs = 0)
    assert(TxnLog.read(spark, dir, Some(6)).count() === 12L,
      "retained DV version must survive vacuum with its sidecars")
    TxnLog.vacuum(spark, dir, retain = 1, orphanGraceMs = 0)
    assert(TxnLog.read(spark, dir).count() === 12L)
    assert(!new java.io.File(dir, "dv").exists() ||
      new java.io.File(dir, "dv").listFiles().isEmpty,
      "orphaned deletion-vector sidecars survived the final vacuum")
  }

  test("merge-on-read delete rejects partitioned tables loudly") {
    import spark.implicits._
    val dir = freshTable()
    TxnLog.appendPartitioned(spark, dir,
      (0L until 12L).map(k => (k, k % 3)).toDF("k", "p").coalesce(1),
      "p", "k")
    val e = intercept[IllegalArgumentException] {
      TxnLog.deleteWhereMoR(spark, dir, "k", 0L, 5L)
    }
    assert(e.getMessage.contains("partitioned"), e.getMessage)
    assert(TxnLog.latestVersion(spark, dir) === Some(1))
  }

  test("changes(): appends are pure inserts, copy-on-write delete yields " +
    "exactly the predicate rows, merge yields delete+insert pairs, " +
    "compact and a concurrent-carry rewrite stay invisible") {
    import spark.implicits._
    val dir = freshTable()
    for (i <- 0 until 3)
      TxnLog.appendWithStats(spark, dir, df(10L * i, 10L * i + 10), "value")
    // append CDC: insert-only, the slice's rows
    val a = TxnLog.changes(spark, dir, 2, 3).collect()
    assert(a.forall(_.getAs[String]("_change_type") == "insert"))
    assert(a.map(_.getLong(0)).sorted === (20L until 30L).toArray)
    // CoW delete CDC: the rewritten remainder cancels itself
    val dv = TxnLog.deleteWhere(spark, dir, "value", 5, 24)
    val d = TxnLog.changes(spark, dir, dv - 1, dv).collect()
    assert(d.forall(_.getAs[String]("_change_type") == "delete"))
    assert(d.map(_.getLong(0)).sorted === (5L to 24L).toArray)
    // full-range CDC composes: net live rows = inserts minus deletes
    val all = TxnLog.changes(spark, dir, 0, dv)
    val net = all.filter("_change_type = 'insert'").select("value")
      .exceptAll(all.filter("_change_type = 'delete'").select("value"))
    assert(net.collect().map(_.getLong(0)).sorted ===
      TxnLog.read(spark, dir).collect().map(_.getLong(0)).sorted)
    // merge CDC: updated key -> delete+insert pair with old and new values
    val dir2 = freshTable()
    TxnLog.appendWithStats(spark, dir2,
      (0L until 10L).map(k => (k, k)).toDF("k", "v").coalesce(1), "k")
    TxnLog.mergeInto(spark, dir2,
      Seq((3L, 30L), (42L, 42L)).toDF("k", "v"), "k")
    val m = TxnLog.changes(spark, dir2, 1, 2).collect()
      .map(r => (r.getAs[String]("_change_type"), r.getLong(0), r.getLong(1)))
      .toSet
    assert(m === Set(("delete", 3L, 3L), ("insert", 3L, 30L),
      ("insert", 42L, 42L)))
  }

  test("delete remainders stay RANGE-CLUSTERED (ADVICE r15 medium): " +
    "after deleting the middle of a 2-file touched range, a probe near " +
    "one edge opens one rewritten file, not both") {
    val dir = freshTable()
    // two adjacent stats files [0,100) and [100,200); delete the middle
    TxnLog.appendWithStats(spark, dir, df(0, 100), "value")
    TxnLog.appendWithStats(spark, dir, df(100, 200), "value")
    TxnLog.deleteWhere(spark, dir, "value", 80, 120)
    // remainders [0,80) and (120,200) rewritten into 2 files — range
    // clustering means each file's span stays on its own side, so an
    // edge probe prunes to ONE file
    val (d1, k1, t1) = TxnLog.readSkipped(spark, dir, "value", 0, 10)
    assert(t1 === 2)
    assert(k1 === 1,
      s"remainder files not range-clustered: edge probe kept $k1 of $t1")
    assert(d1.filter("value BETWEEN 0 AND 10").count() === 11L)
    val (_, k2, _) = TxnLog.readSkipped(spark, dir, "value", 190, 199)
    assert(k2 === 1)
  }
}
