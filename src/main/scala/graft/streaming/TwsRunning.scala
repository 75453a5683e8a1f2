package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Per-user running purchase counter on the `transformWithState` API —
  * Spark 4's arbitrary-state surface (successor of
  * flatMapGroupsWithState, see CustomSessions for the legacy API).
  *
  * State is a single Long per user (the count so far). Each invocation
  * sorts its slice of rows by event time and emits one output row per
  * input row carrying the running count — incremental under streaming
  * (state persists across micro-batches; RocksDB-backed state store),
  * exact under batch (the group sees all rows at once). The batch form is
  * what the DuckDB oracle checks: running count == row_number() over
  * (PARTITION BY user ORDER BY ts).
  *
  * Scale: one shuffle on user_id; O(1) state per user; the per-invocation
  * sort is bounded by the micro-batch's per-user row count. TTLConfig is
  * the knob that would garbage-collect idle users in production.
  */
class RunningCounter
    extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {

  @transient private var nState: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    nState = getHandle.getValueState[Long]("n", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    val ts = rows.map(_._2).toArray
    java.util.Arrays.sort(ts)
    var n = if (nState.exists()) nState.get() else 0L
    val out = ts.map { t => n += 1; (key, t, n) }
    nState.update(n)
    out.iterator
  }
}

object TwsRunning {

  /** (user_id, ts, run_n) per purchase — batch/stream-shared transform. */
  def runningPurchaseCount(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    // transformWithState requires the RocksDB state store (the HDFS-backed
    // default lacks the column-family support TWS state uses) — fail fast
    // with a actionable message instead of a deep executor stack trace.
    require(spark.conf
      .get("spark.sql.streaming.stateStore.providerClass", "")
      .contains("RocksDBStateStoreProvider"),
      "transformWithState needs spark.sql.streaming.stateStore.providerClass" +
        " = org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // Batch transformWithState still loads a real state store, whose
    // executors phone the driver-side StateStoreCoordinator RPC endpoint.
    // That endpoint is created eagerly by the StreamingQueryManager — which
    // nothing constructs in a batch-only session — so touch it here or the
    // store load dies with RpcEndpointNotFoundException.
    spark.streams
    events.filter(col("event_type") === "purchase")
      .select(col("user_id").cast("long"),
        expr("unix_micros(cast(ts as timestamp))")).as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new RunningCounter(), TimeMode.None(),
        OutputMode.Append())
      .toDF("user_id", "ts_us", "run_n")
      .select(col("user_id"),
        expr("cast(timestamp_micros(ts_us) as timestamp_ntz)").as("ts"),
        col("run_n"))
  }
}
