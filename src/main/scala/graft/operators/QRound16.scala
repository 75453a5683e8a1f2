package graft.operators

import graft.QueryPack
import graft.sources.Tables.t
import graft.sources.TxnLog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-16 transactional-layout keys — the VERDICT r15 concurrency and
  * multi-column-stats asks as first-class audited queries:
  *
  *  - `maint_txn_concurrent`: conflict-analyzed concurrent-writer DML
  *    ([[TxnLog.deleteWhere]] + a racing append — Delta's commit
  *    conflict checker). A stats'd append lands INSIDE the delete's
  *    publish window (deterministically, via the fire-once
  *    [[TxnLog.beforeCowPublish]] injection point — the only way to pin
  *    a race for a reproducible audit); because the appended file's key
  *    range is provably disjoint from the delete predicate, the delete
  *    RETRIES automatically and serializes after the append instead of
  *    aborting. The audit replays the interleaving version by version:
  *    v1..7 appends, v8 the concurrent append, v9 the delete — rows,
  *    sums, and file counts must all land as if the two writers had
  *    coordinated. The 100 TB point: without conflict analysis, a busy
  *    ingest table can never schedule a large GDPR delete — every
  *    micro-batch would abort it.
  *  - `scan_txn_skip_multi`: MULTI-COLUMN data skipping
  *    ([[TxnLog.appendWithStats]] with several columns +
  *    [[TxnLog.readSkippedMulti]] — Delta stats on N columns). Files lie
  *    on a 4x2 (o_orderkey quarter x o_custkey half) grid, each manifest
  *    line carrying BOTH columns' (min, max, rows, nulls); the audited
  *    probes show files_scanned dropping on EACH dimension and their
  *    conjunction (8 -> 2 -> 4 -> 1), with residual-filtered totals that
  *    must equal the plain range aggregates regardless of pruning.
  *  - `scan_txn_skip_null`: NULL-COUNT pruning ([[TxnLog.readSkippedNull]]
  *    — Delta's nullCount stats). Only 2 of 8 files contain NULLs in the
  *    probed column; an IS NULL probe opens exactly those 2, and an
  *    IS NULL probe on a never-null column opens ZERO files — the
  *    metadata-only fast path for the classic "find the corrupt rows"
  *    scan.
  *
  * Scale shapes: all pruning decisions are manifest metadata (zero data
  * I/O); per-probe work is one bounded pruned scan + map-side-partial
  * aggregate; audits are log-length-bounded; staged builds one-time per
  * sfDir. */
object QRound16 extends QueryPack {

  /** Memoized persisted (o_orderkey, o_custkey, cents) base shared by
    * every staged txn-table builder (OPTIMIZATION r16): each builder
    * slices it 2–9 times (one filter per appended file) plus stats/write
    * passes inside appendWithStats — un-persisted, every slice re-ran
    * the orders scan + cents arithmetic (9 staged tables x ~10 slices x
    * 2 passes). Builders must project EXACT columns before appending
    * (the written schema is part of the audited layout). */
  private[graft] def centsOrders(s: SparkSession, d: String): DataFrame =
    graft.Memo.memo(s, "centsorders", d)(
      t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        floor(col("o_totalprice") * lit(1e2) + lit(5e-1)).cast(LongType)
          .as("cents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      .select("o_orderkey", "o_custkey", "cents")

  // ---- maint_txn_concurrent ----

  private[graft] val cSlices = 8

  /** Staged once per sfDir: 7 single-file stats appends (o_orderkey
    * slices 0..6 of 8), then a DELETE of [maxk/4, maxk/2] with slice 7
    * appended concurrently inside its publish window. Slice 7's keys
    * start above 7(maxk+1)/8 > maxk/2, so its stats prove disjointness
    * and the delete auto-retries: the log records append v8 then delete
    * v9 — both landed, no manual retry. */
  private[graft] def concTable(s: SparkSession, d: String): String =
    QRound3.staged(s, d, "txnconc") { dir =>
      val o = centsOrders(s, d).drop("o_custkey")
      val maxk = o.agg(max("o_orderkey")).head.getLong(0)
      for (i <- 0 until cSlices - 1)
        TxnLog.appendWithStats(s, dir,
          o.filter(expr(s"o_orderkey * $cSlices DIV ${maxk + 1} = $i"))
            .repartition(1),
          "o_orderkey")
      TxnLog.beforeCowPublish = () => {
        TxnLog.appendWithStats(s, dir,
          o.filter(
            expr(s"o_orderkey * $cSlices DIV ${maxk + 1} = ${cSlices - 1}"))
            .repartition(1),
          "o_orderkey")
        ()
      }
      TxnLog.deleteWhere(s, dir, "o_orderkey", maxk / 4, maxk / 2)
    }

  /** The interleaving audited version-by-version: v1..7 build the
    * range-clustered layout, v8 is the CONCURRENT append (committed while
    * the delete's rewrite was in flight), v9 the conflict-analyzed delete
    * that serialized after it. v9's totals must equal all 8 slices minus
    * exactly the predicate range — the concurrent rows survive the delete
    * they raced — and its file count stays 8 (carry by line + 1:1
    * rewrite). ≤ 9 bounded per-version scans. */
  private def maintTxnConcurrent(s: SparkSession, d: String): DataFrame = {
    val dir = concTable(s, d)
    val latest = TxnLog.latestVersion(s, dir).getOrElse(0)
    (1 to latest).map { v =>
      val op = TxnLog.commitInfo(s, dir, v).getOrElse("op", "")
      TxnLog.read(s, dir, Some(v))
        .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"))
        .select(lit(v).as("version"), lit(op).as("op"),
          lit(TxnLog.snapshotFiles(s, dir, v).size).as("n_files"),
          col("n_rows"), col("sum_cents"))
    }.reduce(_ unionAll _).orderBy("version")
  }

  /** Analytic replay: cumulative slice prefixes for v1..7; v8 holds ALL
    * slices (the racing append); v9 subtracts exactly the delete range
    * from the full table. */
  private val oMaintTxnConcurrent =
    s"""WITH o AS (SELECT o_orderkey,
       |    CAST(floor(o_totalprice * 1e2 + 5e-1) AS BIGINT) AS cents
       |  FROM orders),
       |mk AS (SELECT max(o_orderkey) AS maxk FROM o),
       |s AS (SELECT o_orderkey * $cSlices // (maxk + 1) AS m, count(*) AS n,
       |    CAST(sum(cents) AS BIGINT) AS sc FROM o, mk GROUP BY 1),
       |del AS (SELECT count(*) AS dn, CAST(sum(cents) AS BIGINT) AS dsc
       |  FROM o, mk WHERE o_orderkey BETWEEN maxk // 4 AND maxk // 2),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
       |    CAST(sum(sc) AS BIGINT) AS tsc FROM s)
       |SELECT CAST(v AS INT) AS version,
       |  CASE WHEN v = ${cSlices + 1} THEN 'delete' ELSE 'append' END AS op,
       |  CAST(CASE WHEN v <= $cSlices THEN v ELSE $cSlices END AS INT)
       |    AS n_files,
       |  CASE WHEN v <= $cSlices
       |    THEN (SELECT CAST(sum(n) AS BIGINT) FROM s WHERE m < v)
       |    ELSE (SELECT tn - dn FROM tot, del) END AS n_rows,
       |  CASE WHEN v <= $cSlices
       |    THEN (SELECT CAST(sum(sc) AS BIGINT) FROM s WHERE m < v)
       |    ELSE (SELECT tsc - dsc FROM tot, del) END AS sum_cents
       |FROM (SELECT unnest(generate_series(1, ${cSlices + 1})) AS v)
       |ORDER BY version""".stripMargin

  // ---- scan_txn_skip_multi ----

  private[graft] val mQuarters = 4
  private[graft] val mHalves = 2

  /** Staged once per sfDir: 8 single-file appends on the (o_orderkey
    * quarter x o_custkey half) grid, each committed with stats on BOTH
    * columns — the two-dimensionally clustered ingest layout
    * multi-column skipping exists for. */
  private[graft] def multiTable(s: SparkSession, d: String): String =
    QRound3.staged(s, d, "txnskip2") { dir =>
      val o = centsOrders(s, d)
      val b = o.agg(max("o_orderkey"), max("o_custkey")).head
      val (maxk, maxc) = (b.getLong(0), b.getLong(1))
      for (i <- 0 until mQuarters; h <- 0 until mHalves)
        TxnLog.appendWithStats(s, dir,
          o.filter(expr(s"o_orderkey * $mQuarters DIV ${maxk + 1} = $i " +
              s"AND o_custkey * $mHalves DIV ${maxc + 1} = $h"))
            .repartition(1),
          "o_orderkey", "o_custkey")
    }

  /** Two-column data skipping audited: four probes over the 4x2 grid —
    * o_orderkey-only, o_custkey-only, their conjunction, and the full
    * range — each emitting how many files the pruned read opened next to
    * residual-filtered totals that must equal the plain range aggregates
    * (kept files are always a superset per conjunct). files_scanned must
    * drop on BOTH probe dimensions: 2 of 8 on the key quarter, 4 of 8 on
    * the custkey half, 1 of 8 on their conjunction. */
  private def scanTxnSkipMulti(s: SparkSession, d: String): DataFrame = {
    val dir = multiTable(s, d)
    val b = centsOrders(s, d)
      .agg(max("o_orderkey"), max("o_custkey")).head
    val (maxk, maxc) = (b.getLong(0), b.getLong(1))
    val probes = Seq(
      (1, 0L, maxk / 4, 0L, maxc),
      (2, 0L, maxk, 0L, maxc / 2),
      (3, 0L, maxk / 4, 0L, maxc / 2),
      (4, 0L, maxk, 0L, maxc))
    probes.map { case (p, klo, khi, clo, chi) =>
      val (df, kept, total) = TxnLog.readSkippedMulti(s, dir,
        Seq(("o_orderkey", klo, khi), ("o_custkey", clo, chi)))
      df.filter(col("o_orderkey").between(klo, khi) &&
          col("o_custkey").between(clo, chi))
        .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"))
        .select(lit(p).as("probe"), lit(kept).as("files_scanned"),
          lit(total).as("files_total"), col("n_rows"), col("sum_cents"))
    }.reduce(_ unionAll _).orderBy("probe")
  }

  /** Analytic replay: per-cell actual (min, max) on both columns from the
    * same grid rule; a probe keeps the cells whose ranges intersect on
    * BOTH dimensions; totals are the plain conjunctive aggregates. */
  private val oScanTxnSkipMulti =
    s"""WITH o AS (SELECT o_orderkey, o_custkey,
       |    CAST(floor(o_totalprice * 1e2 + 5e-1) AS BIGINT) AS cents
       |  FROM orders),
       |mk AS (SELECT max(o_orderkey) AS maxk, max(o_custkey) AS maxc FROM o),
       |cell AS (SELECT o_orderkey * $mQuarters // (maxk + 1) AS i,
       |    o_custkey * $mHalves // (maxc + 1) AS h,
       |    min(o_orderkey) AS kmn, max(o_orderkey) AS kmx,
       |    min(o_custkey) AS cmn, max(o_custkey) AS cmx
       |  FROM o, mk GROUP BY 1, 2),
       |pr AS (
       |  SELECT 1 AS probe, CAST(0 AS BIGINT) AS klo, maxk // 4 AS khi,
       |    CAST(0 AS BIGINT) AS clo, maxc AS chi FROM mk
       |  UNION ALL SELECT 2, 0, maxk, 0, maxc // 2 FROM mk
       |  UNION ALL SELECT 3, 0, maxk // 4, 0, maxc // 2 FROM mk
       |  UNION ALL SELECT 4, 0, maxk, 0, maxc FROM mk)
       |SELECT CAST(probe AS INT) AS probe,
       |  CAST((SELECT count(*) FROM cell WHERE kmx >= klo AND kmn <= khi
       |    AND cmx >= clo AND cmn <= chi) AS INT) AS files_scanned,
       |  CAST((SELECT count(*) FROM cell) AS INT) AS files_total,
       |  (SELECT count(*) FROM o WHERE o_orderkey BETWEEN klo AND khi
       |    AND o_custkey BETWEEN clo AND chi) AS n_rows,
       |  (SELECT CAST(sum(cents) AS BIGINT) FROM o
       |    WHERE o_orderkey BETWEEN klo AND khi
       |    AND o_custkey BETWEEN clo AND chi) AS sum_cents
       |FROM pr ORDER BY probe""".stripMargin

  // ---- scan_txn_skip_null ----

  /** Staged once per sfDir: the 8-slice o_orderkey layout where ONLY
    * slices 2 and 5 contain NULLs in `maybe_cents` (every third key's
    * cents nulled there) — stats on both columns carry per-file null
    * counts, so an IS NULL probe can prove 6 of the 8 files clean. */
  private[graft] def nullTable(s: SparkSession, d: String): String =
    QRound3.staged(s, d, "txnskipnull") { dir =>
      val o0 = centsOrders(s, d).drop("o_custkey")
      val maxk = o0.agg(max("o_orderkey")).head.getLong(0)
      val o = o0.select(col("o_orderkey"),
        expr(s"CASE WHEN o_orderkey % 3 = 0 AND " +
          s"o_orderkey * $cSlices DIV ${maxk + 1} IN (2, 5) " +
          "THEN CAST(NULL AS BIGINT) ELSE cents END").as("maybe_cents"))
      for (i <- 0 until cSlices)
        TxnLog.appendWithStats(s, dir,
          o.filter(expr(s"o_orderkey * $cSlices DIV ${maxk + 1} = $i"))
            .repartition(1),
          "o_orderkey", "maybe_cents")
    }

  /** Null-count pruning audited: probe 1 (maybe_cents IS NULL) opens
    * exactly the null-bearing files — 2 of 8 — and its residual-filtered
    * row count and key sum must equal the plain IS NULL aggregate;
    * probe 2 (o_orderkey IS NULL, a never-null column) opens ZERO files
    * and returns the empty aggregate (count 0, sum NULL). The pruning
    * decision costs no data I/O — at 100 TB this is the
    * "find the corrupt rows" scan answered from manifest metadata. */
  private def scanTxnSkipNull(s: SparkSession, d: String): DataFrame = {
    val dir = nullTable(s, d)
    Seq("maybe_cents" -> 1, "o_orderkey" -> 2).map { case (c, p) =>
      val (df, kept, total) = TxnLog.readSkippedNull(s, dir, c)
      df.filter(col(c).isNull)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).as("sum_key"))
        .select(lit(p).as("probe"), lit(kept).as("files_scanned"),
          lit(total).as("files_total"), col("n_rows"), col("sum_key"))
    }.reduce(_ unionAll _).orderBy("probe")
  }

  private val oScanTxnSkipNull =
    s"""WITH base AS (SELECT o_orderkey,
       |    CAST(floor(o_totalprice * 1e2 + 5e-1) AS BIGINT) AS cents
       |  FROM orders),
       |mk AS (SELECT max(o_orderkey) AS maxk FROM base),
       |o AS (SELECT o_orderkey, o_orderkey * $cSlices // (maxk + 1) AS sl,
       |    CASE WHEN o_orderkey % 3 = 0 AND
       |      o_orderkey * $cSlices // (maxk + 1) IN (2, 5)
       |      THEN NULL ELSE cents END AS maybe_cents
       |  FROM base, mk),
       |nl AS (SELECT count(*) AS nn, CAST(sum(o_orderkey) AS BIGINT) AS sk,
       |    CAST(count(DISTINCT sl) AS INT) AS nf
       |  FROM o WHERE maybe_cents IS NULL),
       |tf AS (SELECT CAST(count(DISTINCT sl) AS INT) AS total FROM o)
       |SELECT CAST(1 AS INT) AS probe, (SELECT nf FROM nl) AS files_scanned,
       |  (SELECT total FROM tf) AS files_total,
       |  (SELECT nn FROM nl) AS n_rows, (SELECT sk FROM nl) AS sum_key
       |UNION ALL
       |SELECT 2, 0, (SELECT total FROM tf), CAST(0 AS BIGINT),
       |  CAST(NULL AS BIGINT)
       |ORDER BY probe""".stripMargin

  // ---- scan_txn_partition ----

  /** Staged once per sfDir: two o_orderkey-half appends, each
    * Hive-PARTITIONED by pmod = o_orderkey % 4 with o_orderkey stats
    * ([[TxnLog.appendPartitioned]]) — 8 files on a (half x pmod) grid
    * where the partition dimension rides as `part:` manifest tokens and
    * the key dimension as min/max stats. */
  private[graft] def partTable(s: SparkSession, d: String): String =
    QRound3.staged(s, d, "txnpart") { dir =>
      val o = centsOrders(s, d).drop("o_custkey")
        .withColumn("pmod", col("o_orderkey") % 4)
      val maxk = o.agg(max("o_orderkey")).head.getLong(0)
      for (h <- 0 until 2)
        TxnLog.appendPartitioned(s, dir,
          o.filter(expr(s"o_orderkey * 2 DIV ${maxk + 1} = $h"))
            .repartition(1),
          "pmod", "o_orderkey")
    }

  /** Partition pruning audited (VERDICT r15 missing #3): a partition
    * token reads as degenerate min=max file stats, so partition pruning
    * and min/max skipping are ONE metadata pass — the four probes prune
    * on the partition value alone (2 of 8 files), the key range alone
    * (4 of 8), their conjunction (1 of 8), and nothing (8 of 8), with
    * residual-filtered totals equal to the plain aggregates. The
    * partition column itself is never stored in the data files — it
    * restores from the directory layout at read. At 100 TB the partition
    * dimension is the coarse free prune every lakehouse table leads
    * with; here it composes with file stats at zero data I/O. */
  private def scanTxnPartition(s: SparkSession, d: String): DataFrame = {
    val dir = partTable(s, d)
    val maxk = t(s, d, "orders").agg(max("o_orderkey")).head.getLong(0)
    val probes = Seq(
      (1, 1L, 1L, 0L, maxk),
      (2, 0L, 3L, 0L, maxk / 2),
      (3, 1L, 1L, 0L, maxk / 2),
      (4, 0L, 3L, 0L, maxk))
    probes.map { case (p, plo, phi, klo, khi) =>
      val (df, kept, total) = TxnLog.readSkippedMulti(s, dir,
        Seq(("pmod", plo, phi), ("o_orderkey", klo, khi)))
      df.filter(col("pmod").between(plo, phi) &&
          col("o_orderkey").between(klo, khi))
        .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"))
        .select(lit(p).as("probe"), lit(kept).as("files_scanned"),
          lit(total).as("files_total"), col("n_rows"), col("sum_cents"))
    }.reduce(_ unionAll _).orderBy("probe")
  }

  /** Analytic replay: the (half, pmod) cells with their actual key
    * ranges; a probe keeps cells matching on the partition value AND the
    * key range; totals are the plain conjunctive aggregates. */
  private val oScanTxnPartition =
    s"""WITH o AS (SELECT o_orderkey, o_orderkey % 4 AS pmod,
       |    CAST(floor(o_totalprice * 1e2 + 5e-1) AS BIGINT) AS cents
       |  FROM orders),
       |mk AS (SELECT max(o_orderkey) AS maxk FROM o),
       |cell AS (SELECT o_orderkey * 2 // (maxk + 1) AS h, pmod,
       |    min(o_orderkey) AS kmn, max(o_orderkey) AS kmx
       |  FROM o, mk GROUP BY 1, 2),
       |pr AS (
       |  SELECT 1 AS probe, CAST(1 AS BIGINT) AS plo,
       |    CAST(1 AS BIGINT) AS phi, CAST(0 AS BIGINT) AS klo,
       |    maxk AS khi FROM mk
       |  UNION ALL SELECT 2, 0, 3, 0, maxk // 2 FROM mk
       |  UNION ALL SELECT 3, 1, 1, 0, maxk // 2 FROM mk
       |  UNION ALL SELECT 4, 0, 3, 0, maxk FROM mk)
       |SELECT CAST(probe AS INT) AS probe,
       |  CAST((SELECT count(*) FROM cell WHERE pmod BETWEEN plo AND phi
       |    AND kmx >= klo AND kmn <= khi) AS INT) AS files_scanned,
       |  CAST((SELECT count(*) FROM cell) AS INT) AS files_total,
       |  (SELECT count(*) FROM o WHERE pmod BETWEEN plo AND phi
       |    AND o_orderkey BETWEEN klo AND khi) AS n_rows,
       |  (SELECT CAST(sum(cents) AS BIGINT) FROM o
       |    WHERE pmod BETWEEN plo AND phi
       |    AND o_orderkey BETWEEN klo AND khi) AS sum_cents
       |FROM pr ORDER BY probe""".stripMargin

  // ---- maint_txn_delete_mor ----

  /** Staged once per sfDir: the 8-slice stats layout, then ONE
    * merge-on-read delete of [maxk/4, maxk/2]
    * ([[TxnLog.deleteWhereMoR]] — deletion vectors), then a compact that
    * APPLIES the vectors. */
  private[graft] def morTable(s: SparkSession, d: String): String =
    QRound3.staged(s, d, "txnmor") { dir =>
      val o = centsOrders(s, d).drop("o_custkey")
      val maxk = o.agg(max("o_orderkey")).head.getLong(0)
      for (i <- 0 until cSlices)
        TxnLog.appendWithStats(s, dir,
          o.filter(expr(s"o_orderkey * $cSlices DIV ${maxk + 1} = $i"))
            .repartition(1),
          "o_orderkey")
      TxnLog.deleteWhereMoR(s, dir, "o_orderkey", maxk / 4, maxk / 2)
      TxnLog.compact(s, dir, 2)
    }

  /** MERGE-ON-READ delete audited version-by-version (Delta deletion
    * vectors): v9 deletes the range WITHOUT rewriting a file — its file
    * count stays 8, the headline column: the delete wrote O(matched
    * rows) of sidecar positions instead of rewriting the touched files,
    * which is what makes a small targeted delete on a 100 TB table a
    * kilobyte write. v10's compact applies the vectors (2 clean files,
    * totals unchanged). Readers apply vectors as one broadcast
    * anti-join; history stays readable on both sides of both
    * boundaries. ≤ 10 bounded per-version scans. */
  private def maintTxnDeleteMor(s: SparkSession, d: String): DataFrame = {
    val dir = morTable(s, d)
    val latest = TxnLog.latestVersion(s, dir).getOrElse(0)
    (1 to latest).map { v =>
      val op = TxnLog.commitInfo(s, dir, v).getOrElse("op", "")
      TxnLog.read(s, dir, Some(v))
        .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"))
        .select(lit(v).as("version"), lit(op).as("op"),
          lit(TxnLog.snapshotFiles(s, dir, v).size).as("n_files"),
          col("n_rows"), col("sum_cents"))
    }.reduce(_ unionAll _).orderBy("version")
  }

  /** Analytic replay: cumulative slice prefixes; v9 = total minus the
    * range at an UNCHANGED 8 files; v10 = same totals at 2 files. */
  private val oMaintTxnDeleteMor =
    s"""WITH o AS (SELECT o_orderkey,
       |    CAST(floor(o_totalprice * 1e2 + 5e-1) AS BIGINT) AS cents
       |  FROM orders),
       |mk AS (SELECT max(o_orderkey) AS maxk FROM o),
       |s AS (SELECT o_orderkey * $cSlices // (maxk + 1) AS m, count(*) AS n,
       |    CAST(sum(cents) AS BIGINT) AS sc FROM o, mk GROUP BY 1),
       |del AS (SELECT count(*) AS dn, CAST(sum(cents) AS BIGINT) AS dsc
       |  FROM o, mk WHERE o_orderkey BETWEEN maxk // 4 AND maxk // 2),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
       |    CAST(sum(sc) AS BIGINT) AS tsc FROM s)
       |SELECT CAST(v AS INT) AS version,
       |  CASE WHEN v = 9 THEN 'delete' WHEN v = 10 THEN 'compact'
       |    ELSE 'append' END AS op,
       |  CAST(CASE WHEN v <= 8 THEN v WHEN v = 9 THEN 8 ELSE 2 END AS INT)
       |    AS n_files,
       |  CASE WHEN v <= 8
       |    THEN (SELECT CAST(sum(n) AS BIGINT) FROM s WHERE m < v)
       |    ELSE (SELECT tn - dn FROM tot, del) END AS n_rows,
       |  CASE WHEN v <= 8
       |    THEN (SELECT CAST(sum(sc) AS BIGINT) FROM s WHERE m < v)
       |    ELSE (SELECT tsc - dsc FROM tot, del) END AS sum_cents
       |FROM (SELECT unnest(generate_series(1, 10)) AS v)
       |ORDER BY version""".stripMargin

  // ---- cdc_txn_changes / cdc_txn_merge_changes ----

  /** Per-version CHANGE DATA FEED rollup over a staged txn table
    * ([[TxnLog.changes]] — the diff-based Delta CDF): one row per
    * version with insert/delete counts and cent masses. Reuses an
    * ALREADY-STAGED round-15 table — the CDC surface costs no extra
    * staging. */
  private def cdcRollup(s: SparkSession, dir: String): DataFrame = {
    val latest = TxnLog.latestVersion(s, dir).getOrElse(0)
    (1 to latest).map { v =>
      val op = TxnLog.commitInfo(s, dir, v).getOrElse("op", "")
      TxnLog.changes(s, dir, v - 1, v)
        .agg(
          sum(when(col("_change_type") === "insert", 1L).otherwise(0L))
            .as("ni"),
          sum(when(col("_change_type") === "delete", 1L).otherwise(0L))
            .as("nd"),
          sum(when(col("_change_type") === "insert", col("cents"))
            .otherwise(0L)).as("ci"),
          sum(when(col("_change_type") === "delete", col("cents"))
            .otherwise(0L)).as("cd"))
        .select(lit(v).as("version"), lit(op).as("op"),
          coalesce(col("ni"), lit(0L)).as("n_inserts"),
          coalesce(col("nd"), lit(0L)).as("n_deletes"),
          coalesce(col("ci"), lit(0L)).as("cents_inserted"),
          coalesce(col("cd"), lit(0L)).as("cents_deleted"))
    }.reduce(_ unionAll _).orderBy("version")
  }

  /** CDC across the copy-on-write DELETE boundary: v1..8 are pure
    * inserts (one slice each); v9's manifest diff names the touched
    * files, and the multiset diff of their rows against the rewritten
    * remainder yields EXACTLY the predicate rows as deletes — the
    * remainder cancels itself, so the feed shows the logical change,
    * not the 3x-larger physical rewrite. Zero write-path cost; read
    * cost bounded by the churned files. */
  private def cdcTxnChanges(s: SparkSession, d: String): DataFrame =
    cdcRollup(s, QRound15.delTable(s, d))

  /** Analytic replay: v <= 8 insert slice v-1; v9 deletes exactly the
    * [maxk/4, maxk/2] range. */
  private val oCdcTxnChanges =
    s"""WITH o AS (SELECT o_orderkey,
       |    CAST(floor(o_totalprice * 1e2 + 5e-1) AS BIGINT) AS cents
       |  FROM orders),
       |mk AS (SELECT max(o_orderkey) AS maxk FROM o),
       |s AS (SELECT o_orderkey * 8 // (maxk + 1) AS m, count(*) AS n,
       |    CAST(sum(cents) AS BIGINT) AS sc FROM o, mk GROUP BY 1),
       |del AS (SELECT count(*) AS dn, CAST(sum(cents) AS BIGINT) AS dsc
       |  FROM o, mk WHERE o_orderkey BETWEEN maxk // 4 AND maxk // 2)
       |SELECT CAST(v AS INT) AS version,
       |  CASE WHEN v = 9 THEN 'delete' ELSE 'append' END AS op,
       |  CASE WHEN v <= 8
       |    THEN (SELECT CAST(n AS BIGINT) FROM s WHERE m = v - 1)
       |    ELSE CAST(0 AS BIGINT) END AS n_inserts,
       |  CASE WHEN v = 9 THEN (SELECT CAST(dn AS BIGINT) FROM del)
       |    ELSE CAST(0 AS BIGINT) END AS n_deletes,
       |  CASE WHEN v <= 8 THEN (SELECT sc FROM s WHERE m = v - 1)
       |    ELSE CAST(0 AS BIGINT) END AS cents_inserted,
       |  CASE WHEN v = 9 THEN (SELECT dsc FROM del)
       |    ELSE CAST(0 AS BIGINT) END AS cents_deleted
       |FROM (SELECT unnest(generate_series(1, 9)) AS v)
       |ORDER BY version""".stripMargin

  /** CDC across the MERGE boundary: v9 restates the key range at doubled
    * cents — the diff emits each updated key as a delete+insert PAIR
    * (Delta's update_pre/postimage in multiset terms): deletes carry the
    * original range mass, inserts the doubled mass, counts equal. */
  private def cdcTxnMergeChanges(s: SparkSession, d: String): DataFrame =
    cdcRollup(s, QRound15.mergeTable(s, d))

  private val oCdcTxnMergeChanges =
    s"""WITH o AS (SELECT o_orderkey,
       |    CAST(floor(o_totalprice * 1e2 + 5e-1) AS BIGINT) AS cents
       |  FROM orders),
       |mk AS (SELECT max(o_orderkey) AS maxk FROM o),
       |s AS (SELECT o_orderkey * 8 // (maxk + 1) AS m, count(*) AS n,
       |    CAST(sum(cents) AS BIGINT) AS sc FROM o, mk GROUP BY 1),
       |upd AS (SELECT count(*) AS un, CAST(sum(cents) AS BIGINT) AS usc
       |  FROM o, mk WHERE o_orderkey BETWEEN maxk // 4 AND maxk // 2)
       |SELECT CAST(v AS INT) AS version,
       |  CASE WHEN v = 9 THEN 'merge' ELSE 'append' END AS op,
       |  CASE WHEN v <= 8
       |    THEN (SELECT CAST(n AS BIGINT) FROM s WHERE m = v - 1)
       |    ELSE (SELECT CAST(un AS BIGINT) FROM upd) END AS n_inserts,
       |  CASE WHEN v = 9 THEN (SELECT CAST(un AS BIGINT) FROM upd)
       |    ELSE CAST(0 AS BIGINT) END AS n_deletes,
       |  CASE WHEN v <= 8 THEN (SELECT sc FROM s WHERE m = v - 1)
       |    ELSE (SELECT 2 * usc FROM upd) END AS cents_inserted,
       |  CASE WHEN v = 9 THEN (SELECT usc FROM upd)
       |    ELSE CAST(0 AS BIGINT) END AS cents_deleted
       |FROM (SELECT unnest(generate_series(1, 9)) AS v)
       |ORDER BY version""".stripMargin

  val queries: Map[String, QFn] = Map(
    "maint_txn_concurrent"   -> ((s, d) => maintTxnConcurrent(s, d)),
    "scan_txn_skip_multi"    -> ((s, d) => scanTxnSkipMulti(s, d)),
    "scan_txn_skip_null"     -> ((s, d) => scanTxnSkipNull(s, d)),
    "scan_txn_partition"     -> ((s, d) => scanTxnPartition(s, d)),
    "maint_txn_delete_mor"   -> ((s, d) => maintTxnDeleteMor(s, d)),
    "cdc_txn_changes"        -> ((s, d) => cdcTxnChanges(s, d)),
    "cdc_txn_merge_changes"  -> ((s, d) => cdcTxnMergeChanges(s, d)))

  val oracles: Map[String, String] = Map(
    "maint_txn_concurrent"   -> oMaintTxnConcurrent,
    "scan_txn_skip_multi"    -> oScanTxnSkipMulti,
    "scan_txn_skip_null"     -> oScanTxnSkipNull,
    "scan_txn_partition"     -> oScanTxnPartition,
    "maint_txn_delete_mor"   -> oMaintTxnDeleteMor,
    "cdc_txn_changes"        -> oCdcTxnChanges,
    "cdc_txn_merge_changes"  -> oCdcTxnMergeChanges)
}
