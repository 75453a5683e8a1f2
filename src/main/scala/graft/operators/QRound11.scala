package graft.operators

import graft.QueryPack
import graft.sources.{Tables, TxnLog}
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 additions (VERDICT r10 "What's missing"):
  *
  *  - `maint_txn_log`: snapshot-isolated reads over a versioned-manifest
  *    commit log ([[graft.sources.TxnLog]]) — the transactional-layout
  *    surface beside compaction/SCD2/CDC-merge: three commits (initial
  *    load, concurrent-style append, restatement overwrite) and a
  *    time-travel audit across ALL versions, so a protocol defect in any
  *    snapshot (a dropped base file in the append, a leaked stale file in
  *    the overwrite) breaks the hash. Reader-isolation and the two-writer
  *    race are Round11Spec-gated (no SQL analogue for concurrency).
  */
object QRound11 extends QueryPack {

  /** Staged once per (session, sfDir): a TxnLog table with three commits
    * over deterministic orders slices —
    *   v1 overwrite: o_orderkey % 4 == 0 (initial load)
    *   v2 append:    o_orderkey % 4 == 1 (the concurrent-append shape)
    *   v3 overwrite: o_orderkey % 4 == 2 (restatement)
    * Money kept as exact cents (BIGINT) so the per-version sums are
    * reduce-order-proof. */
  private[graft] def txnTable(s: SparkSession, d: String): String =
    QRound3.staged(s, d, "txnlog") { dir =>
      // memoized persisted slice base (OPTIMIZATION r16) — see
      // QRound16.centsOrders; exact column projection preserved
      val o = QRound16.centsOrders(s, d).drop("o_custkey")
      TxnLog.overwrite(s, dir, o.filter(col("o_orderkey") % 4 === 0))
      TxnLog.append(s, dir, o.filter(col("o_orderkey") % 4 === 1))
      TxnLog.overwrite(s, dir, o.filter(col("o_orderkey") % 4 === 2))
    }

  /** Time-travel audit: one row per committed version with that
    * SNAPSHOT's row count and exact cents total. Scale shape: each
    * snapshot read is an ordinary pruned parquet scan over the pinned
    * manifest file list (pushdown intact), one map-side-partial global
    * aggregate each; the per-version union is bounded by the log length. */
  private def maintTxnLog(s: SparkSession, d: String): DataFrame = {
    val dir = txnTable(s, d)
    val latest = TxnLog.latestVersion(s, dir).getOrElse(0)
    (1 to latest).map { v =>
      TxnLog.read(s, dir, Some(v))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("cents")).as("sum_cents"))
        .select(lit(v).as("version"), col("n_rows"), col("sum_cents"))
    }.reduce(_ unionAll _).orderBy("version")
  }

  /** Replays the three snapshots analytically: v1 = slice 0, v2 =
    * slices {0,1}, v3 = slice 2 only. */
  private val oMaintTxnLog =
    """WITH o AS (SELECT o_orderkey,
      |    CAST(floor(o_totalprice * 1e2 + 5e-1) AS BIGINT) AS cents
      |  FROM orders),
      |v AS (
      |  SELECT 1 AS version, count(*) AS n_rows,
      |    CAST(sum(cents) AS BIGINT) AS sum_cents
      |  FROM o WHERE o_orderkey % 4 = 0
      |  UNION ALL
      |  SELECT 2, count(*), CAST(sum(cents) AS BIGINT)
      |  FROM o WHERE o_orderkey % 4 IN (0, 1)
      |  UNION ALL
      |  SELECT 3, count(*), CAST(sum(cents) AS BIGINT)
      |  FROM o WHERE o_orderkey % 4 = 2)
      |SELECT version, n_rows, sum_cents FROM v ORDER BY version""".stripMargin

  val queries: Map[String, QFn] = Map(
    "maint_txn_log" -> ((s, d) => maintTxnLog(s, d)))

  val oracles: Map[String, String] = Map(
    "maint_txn_log" -> oMaintTxnLog)
}
