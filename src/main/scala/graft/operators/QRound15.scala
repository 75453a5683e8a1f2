package graft.operators

import graft.QueryPack
import graft.sources.Tables.t
import graft.sources.TxnLog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-15 transactional-layout keys: the maintenance and metadata-read
  * surfaces the r14 family still lacked, exposed as first-class audited
  * queries.
  *
  *  - `scan_txn_skip`: per-file min/max DATA SKIPPING
  *    ([[TxnLog.appendWithStats]]/[[TxnLog.readSkipped]] — Delta column
  *    stats / Iceberg manifest min-max). Over a range-clustered 8-file
  *    layout, each audited probe emits how many files the pruned read
  *    OPENED next to totals that must match the plain range aggregate —
  *    pruning is metadata-only and always a correct superset. At 100 TB
  *    this is the difference between planning over ~all footers and
  *    opening 1/8 of them for a selective range.
  *  - `maint_txn_compact`: small-file compaction ([[TxnLog.compact]] —
  *    Delta OPTIMIZE / Iceberg rewrite_data_files). Six single-file
  *    appends build the classic streaming-sink layout (one tiny file per
  *    batch), a compact rewrites the head into 2 files WITHOUT changing a
  *    row, and a post-compact append extends the compacted base. The
  *    audit reads per-version (op, kind, file count, totals): a compact
  *    that loses rows, changes values, fails to shrink the file count, or
  *    rewrites history instead of committing forward breaks rows AND
  *    hash. The 100 TB point is the file count column itself — a year of
  *    minute-batches is ~500k tiny files whose footers dominate scan
  *    planning; compaction is the maintenance pass that keeps scans
  *    healthy, and it must be a COMMIT (time travel across it intact),
  *    not a rewrite.
  *  - `scan_txn_time_travel`: timestamp time travel as an audited query
  *    ([[TxnLog.versionAsOf]]/[[TxnLog.readAsOf]], previously spec-only).
  *    For every version of the 23-append log, resolving the version's own
  *    commit timestamp must land exactly on it, ts−1 must land on its
  *    predecessor (commit timestamps are clamped strictly monotone at
  *    publish — Delta's adjustment), and the snapshot totals at that
  *    timestamp must replay the append prefix. Binary-search resolution
  *    stays O(log versions) manifest reads.
  *
  * Scale shapes: audits are log-length-bounded driver metadata plus
  * either one shared one-scan rollup ([[QRound14.cumulativeByVersion]])
  * or ≤ 8 pruned per-version scans with map-side-partial aggregates;
  * staged builds are one-time per sfDir.
  */
object QRound15 extends QueryPack {

  // ---- maint_txn_compact ----

  private[graft] val cpSlices = 6  // single-file appends before compact
  private[graft] val cpTarget = 2 // compacted file count

  /** Staged once per sfDir: six 1-file appends over deterministic orders
    * slices (o_orderkey % 7 = 0..5), compact to [[cpTarget]] files, then
    * one more 1-file append (% 7 = 6) on the compacted base. Slices are
    * repartition(1)'d so the pre-compact layout is exactly one file per
    * version regardless of scan parallelism. */
  private[graft] def cpTable(s: SparkSession, d: String): String =
    QRound3.staged(s, d, "txncompact") { dir =>
      // memoized persisted slice base (OPTIMIZATION r16) — see
      // QRound16.centsOrders; exact column projection preserved
      val o = QRound16.centsOrders(s, d).drop("o_custkey")
      for (m <- 0 until cpSlices)
        TxnLog.append(s, dir,
          o.filter(col("o_orderkey") % 7 === m).repartition(1))
      TxnLog.compact(s, dir, cpTarget)
      TxnLog.append(s, dir,
        o.filter(col("o_orderkey") % 7 === cpSlices).repartition(1))
    }

  /** Per-version audit across the compact boundary: op + manifest kind
    * from the header, snapshot file count, and totals. v7 (the compact)
    * must carry v6's exact rows in [[cpTarget]] files; v8 extends the
    * compacted base. ≤ 8 bounded per-version reads (the append-only
    * one-scan rollup does not apply — compact rewrites files). */
  private def maintTxnCompact(s: SparkSession, d: String): DataFrame = {
    val dir = cpTable(s, d)
    val latest = TxnLog.latestVersion(s, dir).getOrElse(0)
    (1 to latest).map { v =>
      val info = TxnLog.commitInfo(s, dir, v)
      TxnLog.read(s, dir, Some(v))
        .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"))
        .select(lit(v).as("version"),
          lit(info.getOrElse("op", "")).as("op"),
          lit(info.getOrElse("kind", "full")).as("kind"),
          lit(TxnLog.snapshotFiles(s, dir, v).size).as("n_files"),
          col("n_rows"), col("sum_cents"))
    }.reduce(_ unionAll _).orderBy("version")
  }

  /** Analytic replay: version v ≤ 6 holds slices 0..v−1 in v files;
    * v7 = compact (same rows as v6, cpTarget files); v8 adds slice 6. */
  private val oMaintTxnCompact =
    s"""WITH o AS (SELECT o_orderkey,
       |    CAST(floor(o_totalprice * 1e2 + 5e-1) AS BIGINT) AS cents
       |  FROM orders),
       |s AS (SELECT o_orderkey % 7 AS m, count(*) AS n,
       |    CAST(sum(cents) AS BIGINT) AS sc FROM o GROUP BY 1)
       |SELECT CAST(v AS INT) AS version,
       |  CASE WHEN v = ${cpSlices + 1} THEN 'compact' ELSE 'append' END
       |    AS op,
       |  CASE WHEN v = 1 OR v = ${cpSlices + 1} THEN 'full' ELSE 'delta' END
       |    AS kind,
       |  CAST(CASE WHEN v <= $cpSlices THEN v
       |            WHEN v = ${cpSlices + 1} THEN $cpTarget
       |            ELSE ${cpTarget + 1} END AS INT) AS n_files,
       |  (SELECT CAST(sum(n) AS BIGINT) FROM s
       |    WHERE m <= CASE WHEN v <= $cpSlices THEN v - 1 ELSE v - 2 END)
       |    AS n_rows,
       |  (SELECT CAST(sum(sc) AS BIGINT) FROM s
       |    WHERE m <= CASE WHEN v <= $cpSlices THEN v - 1 ELSE v - 2 END)
       |    AS sum_cents
       |FROM (SELECT unnest(generate_series(1, ${cpSlices + 2})) AS v)
       |ORDER BY version""".stripMargin

  // ---- scan_txn_skip ----

  private[graft] val skSlices = 8

  /** Staged once per sfDir: [[skSlices]] single-file appends, each
    * covering one contiguous o_orderkey range (slice i =
    * `o_orderkey·8 div (maxk+1) = i`), committed via
    * [[TxnLog.appendWithStats]] so every manifest line carries the
    * file's (min, max, rows) for `o_orderkey` — the range-clustered
    * ingest layout data skipping exists for. */
  private[graft] def skTable(s: SparkSession, d: String): String =
    QRound3.staged(s, d, "txnskip") { dir =>
      // memoized persisted slice base (OPTIMIZATION r16) — see
      // QRound16.centsOrders; exact column projection preserved
      val o = QRound16.centsOrders(s, d).drop("o_custkey")
      val maxk = o.agg(max("o_orderkey")).head.getLong(0)
      for (i <- 0 until skSlices)
        TxnLog.appendWithStats(s, dir,
          o.filter(expr(s"o_orderkey * $skSlices DIV ${maxk + 1} = $i"))
            .repartition(1),
          "o_orderkey")
    }

  /** Data skipping audited: four range probes over the stats-clustered
    * table; each emits HOW MANY files the pruned read opened (the 100 TB
    * column — a selective probe on a range-clustered layout must open
    * ~1/8 of the files, a full-range probe all of them) alongside the
    * residual-filtered totals, which must equal the plain range
    * aggregate regardless of pruning (kept files are always a superset).
    * Per-probe work is a bounded pruned scan + map-side-partial
    * aggregate; the pruning decision itself is manifest metadata, no
    * data I/O. */
  private def scanTxnSkip(s: SparkSession, d: String): DataFrame = {
    val dir = skTable(s, d)
    val maxk = t(s, d, "orders").agg(max("o_orderkey")).head.getLong(0)
    val probes = Seq(
      (1, 0L, maxk / 8),
      (2, maxk / 4, maxk / 2),
      (3, maxk - maxk / 8, maxk),
      (4, 0L, maxk))
    probes.map { case (p, lo, hi) =>
      val (df, kept, total) = TxnLog.readSkipped(s, dir, "o_orderkey", lo, hi)
      df.filter(col("o_orderkey").between(lo, hi))
        .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"))
        .select(lit(p).as("probe"), lit(kept).as("files_scanned"),
          lit(total).as("files_total"), col("n_rows"), col("sum_cents"))
    }.reduce(_ unionAll _).orderBy("probe")
  }

  /** Analytic replay: per-slice actual (min, max) from the same slice
    * rule, probe keeps the slices whose range intersects; totals are the
    * plain range aggregates. */
  private val oScanTxnSkip =
    s"""WITH o AS (SELECT o_orderkey,
       |    CAST(floor(o_totalprice * 1e2 + 5e-1) AS BIGINT) AS cents
       |  FROM orders),
       |mk AS (SELECT max(o_orderkey) AS maxk FROM o),
       |sl AS (SELECT o_orderkey * $skSlices // (maxk + 1) AS slice,
       |    min(o_orderkey) AS mn, max(o_orderkey) AS mx
       |  FROM o, mk GROUP BY 1),
       |pr AS (
       |  SELECT 1 AS probe, CAST(0 AS BIGINT) AS lo, maxk // 8 AS hi FROM mk
       |  UNION ALL SELECT 2, maxk // 4, maxk // 2 FROM mk
       |  UNION ALL SELECT 3, maxk - maxk // 8, maxk FROM mk
       |  UNION ALL SELECT 4, 0, maxk FROM mk)
       |SELECT CAST(probe AS INT) AS probe,
       |  CAST((SELECT count(*) FROM sl WHERE mx >= lo AND mn <= hi) AS INT)
       |    AS files_scanned,
       |  CAST($skSlices AS INT) AS files_total,
       |  (SELECT count(*) FROM o WHERE o_orderkey BETWEEN lo AND hi)
       |    AS n_rows,
       |  (SELECT CAST(sum(cents) AS BIGINT) FROM o
       |    WHERE o_orderkey BETWEEN lo AND hi) AS sum_cents
       |FROM pr ORDER BY probe""".stripMargin

  // ---- maint_txn_delete ----

  /** Staged once per sfDir: the same range-clustered 8-file stats layout
    * as [[skTable]] (separate table — delete MUTATES the head, and the
    * skip key's staged table is shared session state), then ONE
    * copy-on-write delete of o_orderkey ∈ [maxk/4, maxk/2]. */
  private[graft] def delTable(s: SparkSession, d: String): String =
    QRound3.staged(s, d, "txndel") { dir =>
      // memoized persisted slice base (OPTIMIZATION r16) — see
      // QRound16.centsOrders; exact column projection preserved
      val o = QRound16.centsOrders(s, d).drop("o_custkey")
      val maxk = o.agg(max("o_orderkey")).head.getLong(0)
      for (i <- 0 until skSlices)
        TxnLog.appendWithStats(s, dir,
          o.filter(expr(s"o_orderkey * $skSlices DIV ${maxk + 1} = $i"))
            .repartition(1),
          "o_orderkey")
      TxnLog.deleteWhere(s, dir, "o_orderkey", maxk / 4, maxk / 2)
    }

  /** Copy-on-write DELETE audited version-by-version: v1..8 build the
    * range-clustered layout, v9 is the delete — its rows/sums must equal
    * the pre-delete snapshot minus exactly the predicate range, its file
    * count stays 8 (untouched files carried by LINE, intersecting files
    * rewritten 1:1), and v8 must still read the FULL data (history never
    * rewritten). The 100 TB point: the rewrite touches only the
    * stats-intersecting files — the skipping layer applied to writes —
    * which is what makes a compliance delete tractable on a petabyte
    * table. ≤ 9 bounded per-version scans. */
  private def maintTxnDelete(s: SparkSession, d: String): DataFrame = {
    val dir = delTable(s, d)
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

  /** Analytic replay: cumulative slice prefixes for v1..8; v9 subtracts
    * exactly the [maxk/4, maxk/2] range. File count: v files while
    * appending, 8 after the delete (intersecting files rewrite 1:1). */
  private val oMaintTxnDelete =
    s"""WITH o AS (SELECT o_orderkey,
       |    CAST(floor(o_totalprice * 1e2 + 5e-1) AS BIGINT) AS cents
       |  FROM orders),
       |mk AS (SELECT max(o_orderkey) AS maxk FROM o),
       |s AS (SELECT o_orderkey * $skSlices // (maxk + 1) AS m, count(*) AS n,
       |    CAST(sum(cents) AS BIGINT) AS sc FROM o, mk GROUP BY 1),
       |del AS (SELECT count(*) AS dn, CAST(sum(cents) AS BIGINT) AS dsc
       |  FROM o, mk WHERE o_orderkey BETWEEN maxk // 4 AND maxk // 2),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
       |    CAST(sum(sc) AS BIGINT) AS tsc FROM s)
       |SELECT CAST(v AS INT) AS version,
       |  CASE WHEN v = 9 THEN 'delete' ELSE 'append' END AS op,
       |  CAST(CASE WHEN v <= $skSlices THEN v ELSE $skSlices END AS INT)
       |    AS n_files,
       |  CASE WHEN v <= $skSlices
       |    THEN (SELECT CAST(sum(n) AS BIGINT) FROM s WHERE m < v)
       |    ELSE (SELECT tn - dn FROM tot, del) END AS n_rows,
       |  CASE WHEN v <= $skSlices
       |    THEN (SELECT CAST(sum(sc) AS BIGINT) FROM s WHERE m < v)
       |    ELSE (SELECT tsc - dsc FROM tot, del) END AS sum_cents
       |FROM (SELECT unnest(generate_series(1, ${skSlices + 1})) AS v)
       |ORDER BY version""".stripMargin

  // ---- upsert_txn_merge ----

  /** Staged once per sfDir: the range-clustered 8-file stats layout,
    * then ONE copy-on-write MERGE whose source restates every row with
    * o_orderkey ∈ [maxk/4, maxk/2] at DOUBLED cents (the CDC
    * restatement shape — same keys, new values). */
  private[graft] def mergeTable(s: SparkSession, d: String): String =
    QRound3.staged(s, d, "txnmerge") { dir =>
      // memoized persisted slice base (OPTIMIZATION r16) — see
      // QRound16.centsOrders; exact column projection preserved
      val o = QRound16.centsOrders(s, d).drop("o_custkey")
      val maxk = o.agg(max("o_orderkey")).head.getLong(0)
      for (i <- 0 until skSlices)
        TxnLog.appendWithStats(s, dir,
          o.filter(expr(s"o_orderkey * $skSlices DIV ${maxk + 1} = $i"))
            .repartition(1),
          "o_orderkey")
      TxnLog.mergeInto(s, dir,
        o.filter(col("o_orderkey").between(maxk / 4, maxk / 2))
          .select(col("o_orderkey"), (col("cents") * 2).as("cents")),
        "o_orderkey")
    }

  /** Copy-on-write MERGE audited version-by-version: v9 restates the
    * predicate range at doubled cents — row count UNCHANGED (every
    * source key matched), sum raised by exactly the range's original
    * mass, file count still 8 (untouched files carry by line, the
    * touched slice rewrites 1:1). The 100 TB point mirrors
    * `maint_txn_delete`: a key-range CDC upsert rewrites only the
    * stats-intersecting files. ≤ 9 bounded per-version scans. */
  private def upsertTxnMerge(s: SparkSession, d: String): DataFrame = {
    val dir = mergeTable(s, d)
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

  /** Analytic replay: cumulative slice prefixes for v1..8; v9 keeps the
    * row count and adds the [maxk/4, maxk/2] range's cents once more
    * (doubling adds the original mass). */
  private val oUpsertTxnMerge =
    s"""WITH o AS (SELECT o_orderkey,
       |    CAST(floor(o_totalprice * 1e2 + 5e-1) AS BIGINT) AS cents
       |  FROM orders),
       |mk AS (SELECT max(o_orderkey) AS maxk FROM o),
       |s AS (SELECT o_orderkey * $skSlices // (maxk + 1) AS m, count(*) AS n,
       |    CAST(sum(cents) AS BIGINT) AS sc FROM o, mk GROUP BY 1),
       |upd AS (SELECT CAST(sum(cents) AS BIGINT) AS dsc
       |  FROM o, mk WHERE o_orderkey BETWEEN maxk // 4 AND maxk // 2),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
       |    CAST(sum(sc) AS BIGINT) AS tsc FROM s)
       |SELECT CAST(v AS INT) AS version,
       |  CASE WHEN v = 9 THEN 'merge' ELSE 'append' END AS op,
       |  CAST(CASE WHEN v <= $skSlices THEN v ELSE $skSlices END AS INT)
       |    AS n_files,
       |  CASE WHEN v <= $skSlices
       |    THEN (SELECT CAST(sum(n) AS BIGINT) FROM s WHERE m < v)
       |    ELSE (SELECT tn FROM tot) END AS n_rows,
       |  CASE WHEN v <= $skSlices
       |    THEN (SELECT CAST(sum(sc) AS BIGINT) FROM s WHERE m < v)
       |    ELSE (SELECT tsc + dsc FROM tot, upd) END AS sum_cents
       |FROM (SELECT unnest(generate_series(1, ${skSlices + 1})) AS v)
       |ORDER BY version""".stripMargin

  // ---- scan_txn_time_travel ----

  /** Timestamp time travel audited over the shared 23-append log
    * ([[QRound14.ckTable]] — no extra staging): each version's own
    * commit ts resolves to itself, ts−1 to its predecessor (0 for v1),
    * and the as-of snapshot totals replay the prefix. Totals come from
    * the shared one-scan rollup; the resolution probes are log-length
    * driver metadata at O(log n) manifest reads each. */
  private def scanTxnTimeTravel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = QRound14.ckTable(s, d)
    val latest = TxnLog.latestVersion(s, dir).getOrElse(0)
    val meta = (1 to latest).map { v =>
      val ts = TxnLog.commitInfo(s, dir, v)("ts").toLong
      val self = TxnLog.versionAsOf(s, dir, ts)
      val prev = if (v == 1) 0 else TxnLog.versionAsOf(s, dir, ts - 1)
      (v, self, prev)
    }.toDF("version", "v_self", "v_prev")
    QRound14.cumulativeByVersion(s, dir, latest)
      .join(broadcast(meta), Seq("version"))
      .select(col("version"), col("v_self"), col("v_prev"),
        col("n_rows"), col("sum_value"))
      .orderBy("version")
  }

  private val oScanTxnTimeTravel = {
    val r = QRound14.ckRowsPer
    s"""SELECT CAST(v AS INT) AS version,
       |  CAST(v AS INT) AS v_self,
       |  CAST(v - 1 AS INT) AS v_prev,
       |  CAST($r * v AS BIGINT) AS n_rows,
       |  CAST(($r * v) * ($r * v - 1) // 2 AS BIGINT) AS sum_value
       |FROM (SELECT unnest(generate_series(1, ${QRound14.ckAppends})) AS v)
       |ORDER BY version""".stripMargin
  }

  val queries: Map[String, QFn] = Map(
    "maint_txn_compact"    -> ((s, d) => maintTxnCompact(s, d)),
    "maint_txn_delete"     -> ((s, d) => maintTxnDelete(s, d)),
    "upsert_txn_merge"     -> ((s, d) => upsertTxnMerge(s, d)),
    "scan_txn_skip"        -> ((s, d) => scanTxnSkip(s, d)),
    "scan_txn_time_travel" -> ((s, d) => scanTxnTimeTravel(s, d)))

  val oracles: Map[String, String] = Map(
    "maint_txn_compact"    -> oMaintTxnCompact,
    "maint_txn_delete"     -> oMaintTxnDelete,
    "upsert_txn_merge"     -> oUpsertTxnMerge,
    "scan_txn_skip"        -> oScanTxnSkip,
    "scan_txn_time_travel" -> oScanTxnTimeTravel)
}
