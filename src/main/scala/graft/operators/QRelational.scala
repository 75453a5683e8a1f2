package graft.operators

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scans, projections, filters, aggregations, sorts and set operations —
  * SURVEY.md §2.1, §2.2, §2.4 (minus the UDAF), §2.6, §2.7.
  *
  * Reference capability: MorphL's churn feature engineering is per-user
  * groupBy aggregation over GA event tables (SURVEY §2 legend "(chp)");
  * ingestion needs scans/dedup ("(ing)").
  *
  * Scale notes: every query here is a single scan + at most one shuffle
  * (the groupBy). Filters and column selections are plain Catalyst
  * expressions, so they reach the parquet reader as PushedFilters/ReadSchema.
  * Partial (map-side) aggregation applies to every agg since all aggregates
  * used are algebraic; `count(distinct)` uses Expand, which is the documented
  * Spark strategy for multi-distinct without a second shuffle per distinct.
  */
object QRelational extends QueryPack {

  // ---- §2.1 scans ----

  private def scanProjectPrune(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")

  private val oScanProjectPrune =
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  private def scanFilterPushdown(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1998-01-01").cast(TimestampType))
      .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")

  private val oScanFilterPushdown =
    """SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---- §2.2 projections / filters ----

  /** Sort-before-project (see QFunctions.fnCastTypes): the derived decimal
    * math runs once, after the range exchange, not in the sampling pass. */
  private def projectArith(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").orderBy("l_orderkey", "l_linenumber").select(
      col("l_orderkey"), col("l_linenumber"),
      revenue.cast(DoubleType).as("disc_price"),
      charge.cast(DoubleType).as("charge_price"))

  private val oProjectArith =
    s"""SELECT l_orderkey, l_linenumber,
       |  CAST($oRevenue AS DOUBLE) AS disc_price,
       |  CAST($oCharge AS DOUBLE) AS charge_price
       |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  private def filterComplex(s: SparkSession, d: String): DataFrame =
    t(s, d, "part").filter(
      (col("p_size").between(5, 15) &&
        col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")) ||
      (col("p_type").like("PRO%") && !col("p_name").like("%bolt%") &&
        col("p_retailprice") > 900.0))
      .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
      .orderBy("p_partkey")

  private val oFilterComplex =
    """SELECT p_partkey, p_name, p_brand, p_type, p_size FROM part
      |WHERE (p_size BETWEEN 5 AND 15
      |       AND p_brand IN ('Brand#1','Brand#2','Brand#3'))
      |   OR (p_type LIKE 'PRO%' AND p_name NOT LIKE '%bolt%'
      |       AND p_retailprice > 900.0)
      |ORDER BY p_partkey""".stripMargin

  private def filterNullSafe(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .withColumn("st", expr("nullif(o_orderstatus, 'P')"))
      .filter(col("st").isNull || (col("st") <=> lit("F")))
      .select("o_orderkey", "st")
      .orderBy("o_orderkey")

  private val oFilterNullSafe =
    """SELECT o_orderkey, nullif(o_orderstatus,'P') AS st FROM orders
      |WHERE nullif(o_orderstatus,'P') IS NULL
      |   OR nullif(o_orderstatus,'P') IS NOT DISTINCT FROM 'F'
      |ORDER BY o_orderkey""".stripMargin

  // ---- §2.4 aggregations ----

  private def aggGlobal(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").agg(
      min(col("l_quantity")).as("min_qty"),
      max(col("l_quantity")).as("max_qty"),
      sum4(col("l_quantity")).as("sum_qty"),
      avg4(col("l_quantity")).as("avg_qty"),
      count(lit(1)).as("n_rows"))

  private val oAggGlobal =
    s"""SELECT min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
       |  ${oSum4("l_quantity")} AS sum_qty, ${oAvg4("l_quantity")} AS avg_qty,
       |  count(*) AS n_rows FROM lineitem""".stripMargin

  /** Flagship: TPC-H Q1 shape — scan -> filter -> hash agg -> sort. */
  private[graft] def aggGroupQ1(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum4(col("l_quantity")).as("sum_qty"),
        sum4(col("l_extendedprice")).as("sum_base_price"),
        sumRevenue.as("sum_disc_price"),
        sumCharge.as("sum_charge"),
        avg4(col("l_quantity")).as("avg_qty"),
        avg4(col("l_extendedprice")).as("avg_price"),
        avg4(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val oAggGroupQ1 =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${oSum4("l_quantity")} AS sum_qty,
       |  ${oSum4("l_extendedprice")} AS sum_base_price,
       |  CAST(SUM($oRevenue) AS DOUBLE) AS sum_disc_price,
       |  CAST(SUM($oCharge) AS DOUBLE) AS sum_charge,
       |  ${oAvg4("l_quantity")} AS avg_qty,
       |  ${oAvg4("l_extendedprice")} AS avg_price,
       |  ${oAvg4("l_discount")} AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  private def aggCountDistinct(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(date_trunc("day", col("ts"))).as("n_days"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  private val oAggCountDistinct =
    """SELECT event_type, count(DISTINCT user_id) AS n_users,
      |  count(DISTINCT date_trunc('day', ts)) AS n_days, count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** HLL++ sketch — no cross-engine oracle (SURVEY §2.4); scalatest asserts
    * the estimate lands within 2% of the exact distinct count. */
  private def aggApproxDistinct(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
      .orderBy("event_type")

  private def aggRollup(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer"); val n = t(s, d, "nation"); val r = t(s, d, "region")
    c.join(n, c("c_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        grouping(col("r_name")).cast(IntegerType).as("g_r"),
        grouping(col("n_name")).cast(IntegerType).as("g_n"))
      .orderBy(col("g_r"), col("g_n"), col("r_name").asc_nulls_first,
        col("n_name").asc_nulls_first)
  }

  private val oAggRollup =
    """SELECT r_name, n_name, count(*) AS n_cust,
      |  CAST(GROUPING(r_name) AS INT) AS g_r, CAST(GROUPING(n_name) AS INT) AS g_n
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY g_r, g_n, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  private def aggCube(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum4(col("o_totalprice")).as("sum_price"),
        grouping(col("o_orderstatus")).cast(IntegerType).as("g_s"),
        grouping(col("o_orderpriority")).cast(IntegerType).as("g_p"))
      .orderBy(col("g_s"), col("g_p"), col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  private val oAggCube =
    s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       |  ${oSum4("o_totalprice")} AS sum_price,
       |  CAST(GROUPING(o_orderstatus) AS INT) AS g_s,
       |  CAST(GROUPING(o_orderpriority) AS INT) AS g_p
       |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
       |ORDER BY g_s, g_p, o_orderstatus ASC NULLS FIRST,
       |  o_orderpriority ASC NULLS FIRST""".stripMargin

  private def aggGroupingSets(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer"); val n = t(s, d, "nation")
    c.join(n, c("c_nationkey") === n("n_nationkey"))
      .groupingSets(
        Seq(Seq(col("c_mktsegment")), Seq(col("n_name")), Seq.empty),
        col("c_mktsegment"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        grouping(col("c_mktsegment")).cast(IntegerType).as("g_m"),
        grouping(col("n_name")).cast(IntegerType).as("g_n"))
      .orderBy(col("g_m"), col("g_n"), col("c_mktsegment").asc_nulls_first,
        col("n_name").asc_nulls_first)
  }

  private val oAggGroupingSets =
    """SELECT c_mktsegment, n_name, count(*) AS n_cust,
      |  CAST(GROUPING(c_mktsegment) AS INT) AS g_m,
      |  CAST(GROUPING(n_name) AS INT) AS g_n
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY GROUPING SETS ((c_mktsegment), (n_name), ())
      |ORDER BY g_m, g_n, c_mktsegment ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  private def aggHaving(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), sum4(col("o_totalprice")).as("sum_price"))
      .filter(col("n_orders") > 12)
      .orderBy("o_custkey")

  private val oAggHaving =
    s"""SELECT o_custkey, count(*) AS n_orders, ${oSum4("o_totalprice")} AS sum_price
       |FROM orders GROUP BY o_custkey HAVING count(*) > 12
       |ORDER BY o_custkey""".stripMargin

  private def aggStats(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        trunc4(stddev_samp(col("l_extendedprice"))).as("sd_price"),
        trunc4(var_samp(col("l_quantity"))).as("var_qty"),
        trunc6(corr(col("l_extendedprice"), col("l_quantity"))).as("corr_pq"),
        trunc4(covar_samp(col("l_extendedprice"), col("l_quantity"))).as("cov_pq"))
      .orderBy("l_returnflag")

  private val oAggStats =
    s"""SELECT l_returnflag,
       |  ${oTrunc4("stddev_samp(l_extendedprice)")} AS sd_price,
       |  ${oTrunc4("var_samp(l_quantity)")} AS var_qty,
       |  ${oTrunc6("corr(l_extendedprice, l_quantity)")} AS corr_pq,
       |  ${oTrunc4("covar_samp(l_extendedprice, l_quantity)")} AS cov_pq
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Per-user ordered event-type sequence (MorphL session sequences).
    * Emitted as a joined string: portable to hash across engines. */
  private def aggCollectSorted(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        array_join(sort_array(collect_list(col("event_type"))), ",").as("types"))
      .orderBy("user_id")

  private val oAggCollectSorted =
    """SELECT user_id, count(*) AS n_events,
      |  array_to_string(list_sort(list(event_type)), ',') AS types
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---- §2.6 sorts / limits ----

  private def sortMultiNull(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .withColumn("seg", expr("nullif(c_mktsegment, 'BUILDING')"))
      .select("c_custkey", "seg", "c_acctbal")
      .orderBy(col("seg").asc_nulls_first, col("c_acctbal").desc_nulls_last,
        col("c_custkey"))

  private val oSortMultiNull =
    """SELECT c_custkey, nullif(c_mktsegment,'BUILDING') AS seg, c_acctbal
      |FROM customer
      |ORDER BY seg ASC NULLS FIRST, c_acctbal DESC NULLS LAST, c_custkey""".stripMargin

  private def limitTopk(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .limit(20)

  private val oLimitTopk =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  // ---- §2.7 set operations (cohort algebra over event user sets) ----

  private def users(s: SparkSession, d: String, et: String): DataFrame =
    t(s, d, "events").filter(col("event_type") === et).select("user_id")

  private def setUnionAll(s: SparkSession, d: String): DataFrame =
    users(s, d, "purchase").unionAll(users(s, d, "signup"))
      .groupBy("user_id").agg(count(lit(1)).as("n")).orderBy("user_id")

  private val oSetUnionAll =
    """SELECT user_id, count(*) AS n FROM (
      |  SELECT user_id FROM events WHERE event_type='purchase'
      |  UNION ALL SELECT user_id FROM events WHERE event_type='signup')
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  private def setUnionDistinct(s: SparkSession, d: String): DataFrame =
    users(s, d, "purchase").union(users(s, d, "signup")).distinct()
      .orderBy("user_id")

  private val oSetUnionDistinct =
    """SELECT user_id FROM events WHERE event_type='purchase'
      |UNION SELECT user_id FROM events WHERE event_type='signup'
      |ORDER BY user_id""".stripMargin

  private def setIntersect(s: SparkSession, d: String): DataFrame =
    users(s, d, "purchase").intersect(users(s, d, "click")).orderBy("user_id")

  private val oSetIntersect =
    """SELECT user_id FROM events WHERE event_type='purchase'
      |INTERSECT SELECT user_id FROM events WHERE event_type='click'
      |ORDER BY user_id""".stripMargin

  /** Purchasers with no URGENT order — cohorts chosen so the difference is
    * non-empty at every sf (every event cohort equals every other, so an
    * event-vs-event EXCEPT proved nothing; probed: 22 rows at sf0.01). */
  private def setExcept(s: SparkSession, d: String): DataFrame =
    users(s, d, "purchase")
      .except(t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("user_id")))
      .orderBy("user_id")

  private val oSetExcept =
    """SELECT user_id FROM events WHERE event_type='purchase'
      |EXCEPT SELECT o_custkey AS user_id FROM orders WHERE o_orderpriority='1-URGENT'
      |ORDER BY user_id""".stripMargin

  /** Bag-semantics intersection: each user appears min(#purchases, #clicks)
    * times (multiset cohort algebra — INTERSECT ALL). Duplicate output rows
    * are identical, so the sorted emission is deterministic. */
  private def setIntersectAll(s: SparkSession, d: String): DataFrame =
    users(s, d, "purchase").intersectAll(users(s, d, "click"))
      .orderBy("user_id")

  private val oSetIntersectAll =
    """SELECT user_id FROM events WHERE event_type='purchase'
      |INTERSECT ALL SELECT user_id FROM events WHERE event_type='click'
      |ORDER BY user_id""".stripMargin

  /** Bag-semantics difference: purchases beyond the user's click count
    * survive (EXCEPT ALL) — 293 rows at sf0.01, discriminating. */
  private def setExceptAll(s: SparkSession, d: String): DataFrame =
    users(s, d, "purchase").exceptAll(users(s, d, "click"))
      .orderBy("user_id")

  private val oSetExceptAll =
    """SELECT user_id FROM events WHERE event_type='purchase'
      |EXCEPT ALL SELECT user_id FROM events WHERE event_type='click'
      |ORDER BY user_id""".stripMargin

  /** arg-max/arg-min surface (max_by/min_by ⇄ DuckDB arg_max/arg_min):
    * first/last event and last user per type, ordered by ts — which is
    * globally unique at every sf (probed), so the arg is deterministic. */
  private def aggArgMinmax(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy("event_type")
      .agg(max_by(col("event_id"), col("ts")).as("last_event_id"),
        min_by(col("event_id"), col("ts")).as("first_event_id"),
        max_by(col("user_id"), col("ts")).as("last_user"))
      .orderBy("event_type")

  private val oAggArgMinmax =
    """SELECT event_type,
      |  arg_max(event_id, ts) AS last_event_id,
      |  arg_min(event_id, ts) AS first_event_id,
      |  arg_max(user_id, ts) AS last_user
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- wiring ----

  val queries: Map[String, QFn] = Map(
    "scan_project_prune"   -> scanProjectPrune _,
    "scan_filter_pushdown" -> scanFilterPushdown _,
    "project_arith"        -> projectArith _,
    "filter_complex"       -> filterComplex _,
    "filter_null_safe"     -> filterNullSafe _,
    "agg_global"           -> aggGlobal _,
    "agg_group_q1"         -> aggGroupQ1 _,
    "agg_count_distinct"   -> aggCountDistinct _,
    "agg_approx_distinct"  -> aggApproxDistinct _,
    "agg_rollup"           -> aggRollup _,
    "agg_cube"             -> aggCube _,
    "agg_grouping_sets"    -> aggGroupingSets _,
    "agg_having"           -> aggHaving _,
    "agg_stats"            -> aggStats _,
    "agg_collect_sorted"   -> aggCollectSorted _,
    "sort_multi_null"      -> sortMultiNull _,
    "limit_topk"           -> limitTopk _,
    "set_union_all"        -> setUnionAll _,
    "set_union_distinct"   -> setUnionDistinct _,
    "set_intersect"        -> setIntersect _,
    "set_except"           -> setExcept _,
    "set_intersect_all"    -> setIntersectAll _,
    "set_except_all"       -> setExceptAll _,
    "agg_arg_minmax"       -> aggArgMinmax _)

  val oracles: Map[String, String] = Map(
    "scan_project_prune"   -> oScanProjectPrune,
    "scan_filter_pushdown" -> oScanFilterPushdown,
    "project_arith"        -> oProjectArith,
    "filter_complex"       -> oFilterComplex,
    "filter_null_safe"     -> oFilterNullSafe,
    "agg_global"           -> oAggGlobal,
    "agg_group_q1"         -> oAggGroupQ1,
    "agg_count_distinct"   -> oAggCountDistinct,
    "agg_rollup"           -> oAggRollup,
    "agg_cube"             -> oAggCube,
    "agg_grouping_sets"    -> oAggGroupingSets,
    "agg_having"           -> oAggHaving,
    "agg_stats"            -> oAggStats,
    "agg_collect_sorted"   -> oAggCollectSorted,
    "sort_multi_null"      -> oSortMultiNull,
    "limit_topk"           -> oLimitTopk,
    "set_union_all"        -> oSetUnionAll,
    "set_union_distinct"   -> oSetUnionDistinct,
    "set_intersect"        -> oSetIntersect,
    "set_except"           -> oSetExcept,
    "set_intersect_all"    -> oSetIntersectAll,
    "set_except_all"       -> oSetExceptAll,
    "agg_arg_minmax"       -> oAggArgMinmax)
}
