package graft.operators

import graft.QueryPack
import graft.sources.{Tables, TxnLog}
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-12 additions (VERDICT r11 "Next round" #3 and #7):
  *
  *  - `stream_txn_sink`: the exactly-once streaming capstone — round 11
  *    built a continuously-generating source (`stream_rate_source`) and a
  *    transactional table ([[graft.sources.TxnLog]]); this key composes
  *    them. A `foreachBatch` sink is at-least-once (a restarted query
  *    REPLAYS its last batch), so the sink commits each micro-batch via
  *    [[TxnLog.appendBatch]], which stamps the batch id into the
  *    atomically-published manifest and SKIPS ids already committed —
  *    at-least-once delivery × idempotent commit = exactly-once tables
  *    (the Delta `txnVersion` pattern). The staged build runs the sink
  *    loop batch-for-batch over the deterministic rate-twin rows AND
  *    replays two batch ids mid-stream the way a crashed-and-restarted
  *    query would; the audit emits every version's batch id + cumulative
  *    snapshot totals, so a broken skip (extra version, doubled rows)
  *    breaks the row count and the hash. The REAL kill-and-restart
  *    rate-micro-batch run is StreamingSpec-gated (wall-clock streaming
  *    has no SQL analogue).
  *
  *  - `maint_txn_vacuum`: retention-bounded cleanup over the commit log —
  *    [[TxnLog.vacuum]] keeps the newest `retain` manifests and deletes
  *    only data files no retained manifest references. The audit reads
  *    every version 1..latest AFTER a vacuum(retain=2): retained versions
  *    report their snapshot totals, vacuumed ones report NULL via the
  *    loud read failure — both outcomes land in the hash. Pinned-reader
  *    survival and staging-litter cleanup are Round12Spec-gated.
  */
object QRound12 extends QueryPack {

  // ---- stream_txn_sink ----

  private[graft] val sinkBatches = 8
  private[graft] val sinkRowsPerBatch = 250L

  /** Staged once per sfDir: the foreachBatch→TxnLog sink loop, simulated
    * batch-for-batch (same dataflow as the StreamingSpec live run; the
    * batch slices ARE what rate-micro-batch emits per trigger). Batches
    * 3 and 6 are committed twice — the at-least-once replay a restart
    * produces — and must be skipped by the idempotent commit. */
  private[graft] def sinkTable(s: SparkSession, d: String): String =
    QRound3.staged(s, d, "txnsink") { dir =>
      def slice(b: Int): DataFrame =
        s.range(b * sinkRowsPerBatch, (b + 1) * sinkRowsPerBatch, 1, 2)
          .toDF("value")
      for (b <- 0 until sinkBatches) {
        TxnLog.appendBatch(s, dir, slice(b), b.toLong)
        // a restarted query replays its last batch with identical content
        if (b == 3 || b == 6) TxnLog.appendBatch(s, dir, slice(b), b.toLong)
      }
    }

  /** Per-version audit of the sink table: the commit's batch id (from the
    * manifest metadata) plus the SNAPSHOT's cumulative count and sum.
    * Exactly-once means exactly `sinkBatches` versions, version v
    * carrying batch id v−1 and the totals of values [0, 250·v). Scale
    * shape: each snapshot read is a pruned parquet scan + one map-side-
    * partial global aggregate; the union is bounded by the log length. */
  private def streamTxnSink(s: SparkSession, d: String): DataFrame = {
    val dir = sinkTable(s, d)
    val latest = TxnLog.latestVersion(s, dir).getOrElse(0)
    (1 to latest).map { v =>
      val batchId = TxnLog.commitInfo(s, dir, v)
        .get("batchId").map(_.toLong)
      TxnLog.read(s, dir, Some(v))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("value")).as("sum_value"))
        .select(lit(v).as("version"),
          batchId.map(lit(_)).getOrElse(lit(null))
            .cast(LongType).as("batch_id"),
          col("n_rows"), col("sum_value"))
    }.reduce(_ unionAll _).orderBy("version")
  }

  /** Analytic replay: version v = values [0, 250v) — n = 250v,
    * sum = 250v(250v−1)/2; the two replayed batch ids add NO versions. */
  private val oStreamTxnSink =
    s"""SELECT CAST(v AS INT) AS version, CAST(v - 1 AS BIGINT) AS batch_id,
       |  CAST($sinkRowsPerBatch * v AS BIGINT) AS n_rows,
       |  CAST(($sinkRowsPerBatch * v) * ($sinkRowsPerBatch * v - 1) // 2
       |    AS BIGINT) AS sum_value
       |FROM (SELECT unnest(generate_series(1, $sinkBatches)) AS v)
       |ORDER BY version""".stripMargin

  // ---- maint_txn_vacuum ----

  private[graft] val vacRetain = 2

  /** Staged once per sfDir: five commits over deterministic orders
    * slices, then vacuum(retain = 2) — versions 1..3 drop, 4..5 survive.
    *   v1 overwrite: o_orderkey % 5 == 0     v2 append: % 5 == 1
    *   v3 append:    % 5 == 2                v4 OVERWRITE: % 5 == 3
    *   v5 append:    % 5 == 4
    * The v4 restatement makes v1–v3's data files unreferenced by any
    * retained manifest, so vacuum reclaims them. */
  private[graft] def vacTable(s: SparkSession, d: String): String =
    QRound3.staged(s, d, "txnvac") { dir =>
      // memoized persisted slice base (OPTIMIZATION r16) — see
      // QRound16.centsOrders; exact column projection preserved
      val o = QRound16.centsOrders(s, d).drop("o_custkey")
      TxnLog.overwrite(s, dir, o.filter(col("o_orderkey") % 5 === 0))
      TxnLog.append(s, dir, o.filter(col("o_orderkey") % 5 === 1))
      TxnLog.append(s, dir, o.filter(col("o_orderkey") % 5 === 2))
      TxnLog.overwrite(s, dir, o.filter(col("o_orderkey") % 5 === 3))
      TxnLog.append(s, dir, o.filter(col("o_orderkey") % 5 === 4))
      TxnLog.vacuum(s, dir, vacRetain)
    }

  /** Post-vacuum audit across ALL historical versions: retained ones
    * aggregate their pinned snapshot, vacuumed ones fail loudly and
    * report NULLs — the try/catch is per-version model state, bounded by
    * the log length, never row-scale. */
  private def maintTxnVacuum(s: SparkSession, d: String): DataFrame = {
    val dir = vacTable(s, d)
    import scala.util.Try
    (1 to 5).map { v =>
      Try(TxnLog.read(s, dir, Some(v))).toOption match {
        case Some(df) =>
          df.agg(count(lit(1)).as("n_rows"),
              sum(col("cents")).as("sum_cents"))
            .select(lit(v).as("version"), lit("retained").as("status"),
              col("n_rows"), col("sum_cents"))
        case None =>
          s.range(1).select(lit(v).as("version"),
            lit("vacuumed").as("status"),
            lit(null).cast(LongType).as("n_rows"),
            lit(null).cast(LongType).as("sum_cents"))
      }
    }.reduce(_ unionAll _).orderBy("version")
  }

  private val oMaintTxnVacuum =
    """WITH o AS (SELECT o_orderkey,
      |    CAST(floor(o_totalprice * 1e2 + 5e-1) AS BIGINT) AS cents
      |  FROM orders),
      |v AS (
      |  SELECT 1 AS version, 'vacuumed' AS status,
      |    CAST(NULL AS BIGINT) AS n_rows, CAST(NULL AS BIGINT) AS sum_cents
      |  UNION ALL SELECT 2, 'vacuumed', NULL, NULL
      |  UNION ALL SELECT 3, 'vacuumed', NULL, NULL
      |  UNION ALL
      |  SELECT 4, 'retained', count(*), CAST(sum(cents) AS BIGINT)
      |  FROM o WHERE o_orderkey % 5 = 3
      |  UNION ALL
      |  SELECT 5, 'retained', count(*), CAST(sum(cents) AS BIGINT)
      |  FROM o WHERE o_orderkey % 5 IN (3, 4))
      |SELECT version, status, n_rows, sum_cents FROM v ORDER BY version""".stripMargin

  // ---- scan_txn_incremental ----

  /** Incremental consumption over the sink table ([[TxnLog
    * .readIncremental]] — the Delta-CDF-lite surface): a downstream
    * consumer that last saw version 3 catches up to version 7 by reading
    * ONLY the files those four appends added — values [750, 1750) —
    * never re-scanning the table. The audit emits one row per consumed
    * version step (the poll-loop shape) with each delta's count/sum/
    * bounds, so a leaked base file or a missed append breaks the hash.
    * Scale shape: each step is a parquet scan over exactly the delta
    * files; the manifest set-difference is O(files) driver-side text. */
  private[graft] val incFromV = 3
  private[graft] val incToV = 7

  private def scanTxnIncremental(s: SparkSession, d: String): DataFrame = {
    val dir = sinkTable(s, d)
    (incFromV + 1 to incToV).map { v =>
      TxnLog.readIncremental(s, dir, v - 1, v)
        .agg(count(lit(1)).as("n_rows"), sum(col("value")).as("sum_value"),
          min(col("value")).as("min_value"), max(col("value")).as("max_value"))
        .select(lit(v).as("version"), col("n_rows"), col("sum_value"),
          col("min_value"), col("max_value"))
    }.reduce(_ unionAll _).orderBy("version")
  }

  /** Version v appended exactly values [250(v−1), 250v). */
  private val oScanTxnIncremental =
    s"""SELECT CAST(v AS INT) AS version,
       |  CAST($sinkRowsPerBatch AS BIGINT) AS n_rows,
       |  CAST(($sinkRowsPerBatch * (v - 1) + $sinkRowsPerBatch * v - 1)
       |    * $sinkRowsPerBatch // 2 AS BIGINT) AS sum_value,
       |  CAST($sinkRowsPerBatch * (v - 1) AS BIGINT) AS min_value,
       |  CAST($sinkRowsPerBatch * v - 1 AS BIGINT) AS max_value
       |FROM (SELECT unnest(generate_series(${incFromV + 1}, $incToV)) AS v)
       |ORDER BY version""".stripMargin

  // ---- scan_txn_schema_evolve ----

  /** Staged once per sfDir: additive schema evolution inside one commit
    * log — v1 appends (o_orderkey, cents), v2 appends the same shape
    * PLUS a `priority` column. */
  private[graft] def evolveTable(s: SparkSession, d: String): String =
    QRound3.staged(s, d, "txnevolve") { dir =>
      val o = t(s, d, "orders").select(col("o_orderkey"),
        floor(col("o_totalprice") * lit(1e2) + lit(5e-1)).cast(LongType)
          .as("cents"), col("o_orderpriority"))
      TxnLog.append(s, dir, o.filter(col("o_orderkey") % 3 === 0)
        .drop("o_orderpriority"))
      TxnLog.append(s, dir, o.filter(col("o_orderkey") % 3 === 1)
        .withColumnRenamed("o_orderpriority", "priority"))
    }

  /** Additive schema evolution read (`TxnLog.read(mergeSchema = true)`):
    * the latest snapshot spans a pre-evolution commit (no `priority`
    * column) and a post-evolution one; the merged read exposes the union
    * schema with NULLs for the old files, exactly Delta/Iceberg's
    * additive-evolution contract. The audit rolls up by priority with
    * the NULL bucket coalesced to a sentinel, so a dropped column, a
    * misattributed NULL, or a file read under the wrong footer breaks
    * the hash. Scale shape: one pruned scan + one map-side-partial
    * group-by; schema merging is a footer-level driver concern. */
  private def scanTxnSchemaEvolve(s: SparkSession, d: String): DataFrame = {
    val dir = evolveTable(s, d)
    TxnLog.read(s, dir, mergeSchema = true)
      .groupBy(coalesce(col("priority"), lit("(pre-evolution)"))
        .as("priority"))
      .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"))
      .orderBy("priority")
  }

  private val oScanTxnSchemaEvolve =
    """WITH o AS (SELECT o_orderkey,
      |    CAST(floor(o_totalprice * 1e2 + 5e-1) AS BIGINT) AS cents,
      |    o_orderpriority
      |  FROM orders),
      |u AS (
      |  SELECT '(pre-evolution)' AS priority, cents
      |  FROM o WHERE o_orderkey % 3 = 0
      |  UNION ALL
      |  SELECT o_orderpriority, cents FROM o WHERE o_orderkey % 3 = 1)
      |SELECT priority, count(*) AS n_rows,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM u GROUP BY priority ORDER BY priority""".stripMargin

  val queries: Map[String, QFn] = Map(
    "stream_txn_sink"        -> streamTxnSink _,
    "maint_txn_vacuum"       -> maintTxnVacuum _,
    "scan_txn_incremental"   -> scanTxnIncremental _,
    "scan_txn_schema_evolve" -> scanTxnSchemaEvolve _)

  val oracles: Map[String, String] = Map(
    "stream_txn_sink"        -> oStreamTxnSink,
    "maint_txn_vacuum"       -> oMaintTxnVacuum,
    "scan_txn_incremental"   -> oScanTxnIncremental,
    "scan_txn_schema_evolve" -> oScanTxnSchemaEvolve)
}
