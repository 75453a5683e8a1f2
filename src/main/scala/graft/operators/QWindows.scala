package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Window functions — SURVEY.md §2.5. MorphL's recency/frequency features
  * are all "per client_id ordered by time" windows [SURVEY §2 legend (chp)].
  *
  * Scale notes: each query is exactly one shuffle (partitionBy key) followed
  * by an in-partition sort — the optimal distributed plan for windowed
  * analytics. Frames are ROWS/RANGE-bounded so state is O(frame), not
  * O(partition). Deterministic rank/ntile require a total order => every
  * window ORDER BY ends with a unique key where semantics allow it.
  */
object QWindows extends QueryPack {

  /** Latest event per user — the row_number()=1 dedup idiom. */
  private def winRowNumber(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    t(s, d, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "ts", "event_type")
      .orderBy("user_id")
  }

  private val oWinRowNumber =
    """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts DESC, event_id DESC) AS rn FROM events)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  private def winRankDense(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc)
    t(s, d, "customer")
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"))
      .orderBy("c_nationkey", "c_custkey")
  }

  private val oWinRankDense =
    """SELECT c_nationkey, c_custkey, c_acctbal,
      |  CAST(rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS INT) AS rnk,
      |  CAST(dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS INT) AS drnk
      |FROM customer ORDER BY c_nationkey, c_custkey""".stripMargin

  /** Inter-event gap per user in microseconds — sessionization precursor. */
  private def winLagLead(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t(s, d, "events")
      .withColumn("us", expr("unix_micros(cast(ts as timestamp))"))
      .select(col("event_id"), col("user_id"), col("ts"),
        (col("us") - lag(col("us"), 1).over(w)).as("gap_us"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .orderBy("event_id")
  }

  private val oWinLagLead =
    """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
      |  epoch_us(ts) - lag(epoch_us(ts)) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us,
      |  lead(event_type) OVER
      |    (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      |FROM events ORDER BY event_id""".stripMargin

  /** Running revenue per customer — exact decimal running sum. */
  private def winRunningSum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(dec4(col("o_totalprice"))).over(w).cast(DoubleType).as("running"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  private val oWinRunningSum =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
      |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  /** 30-day trailing order total: RANGE frame over epoch seconds (Spark
    * rangeBetween is numeric, so order by unix seconds; DuckDB uses a native
    * INTERVAL RANGE frame — both are [ts-30d, ts] inclusive). */
  private def winRangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("epoch_s"))
      .rangeBetween(-2592000L, 0L)
    t(s, d, "orders")
      .withColumn("epoch_s",
        col("o_orderdate").cast(TimestampType).cast(LongType))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(dec4(col("o_totalprice"))).over(w).cast(DoubleType).as("trailing30"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  private val oWinRangeFrame =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate
      |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing30
      |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  /** Account-balance quartiles per nation (deterministic: unique tiebreak). */
  private def winNtile(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(s, d, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"))
      .orderBy("c_custkey")
  }

  private val oWinNtile =
    """SELECT c_custkey, c_nationkey, c_acctbal,
      |  CAST(ntile(4) OVER (PARTITION BY c_nationkey
      |    ORDER BY c_acctbal DESC, c_custkey) AS INT) AS quartile
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** first_value/last_value with an explicit full frame. */
  private def winFirstLast(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        first_value(col("o_orderkey")).over(w).as("first_ok"),
        last_value(col("o_orderkey")).over(w).as("last_ok"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val oWinFirstLast =
    """SELECT o_custkey, o_orderkey,
      |  first_value(o_orderkey) OVER w AS first_ok,
      |  last_value(o_orderkey) OVER w AS last_ok
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** nth_value over the full frame: the customer's 2nd-earliest order
    * (common "second purchase" cohort feature). Null for 1-order
    * customers — exercises the function's null emission. */
  private def winNthValue(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_ok"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val oWinNthValue =
    """SELECT o_custkey, o_orderkey,
      |  nth_value(o_orderkey, 2) OVER w AS second_ok
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Top-3 orders per customer — rank-filter top-k per group. */
  private def topkPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, d, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  private val oTopkPerGroup =
    """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
      |  SELECT *, row_number() OVER (PARTITION BY o_custkey
      |    ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  val queries: Map[String, QFn] = Map(
    "win_row_number"  -> winRowNumber _,
    "win_rank_dense"  -> winRankDense _,
    "win_lag_lead"    -> winLagLead _,
    "win_running_sum" -> winRunningSum _,
    "win_range_frame" -> winRangeFrame _,
    "win_ntile"       -> winNtile _,
    "win_first_last"  -> winFirstLast _,
    "win_nth_value"   -> winNthValue _,
    "topk_per_group"  -> topkPerGroup _)

  val oracles: Map[String, String] = Map(
    "win_row_number"  -> oWinRowNumber,
    "win_rank_dense"  -> oWinRankDense,
    "win_lag_lead"    -> oWinLagLead,
    "win_running_sum" -> oWinRunningSum,
    "win_range_frame" -> oWinRangeFrame,
    "win_ntile"       -> oWinNtile,
    "win_first_last"  -> oWinFirstLast,
    "win_nth_value"   -> oWinNthValue,
    "topk_per_group"  -> oTopkPerGroup)
}
