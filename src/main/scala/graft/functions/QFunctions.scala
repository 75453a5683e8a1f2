package graft.functions

import graft.QueryPack
import graft.sources.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar function surface — SURVEY.md §2.8: strings, regex, datetime,
  * math, conditionals, casts, arrays, maps, JSON, structs, and the UDF
  * registration path.
  *
  * Reference capability: MorphL parses raw GA JSON payloads
  * (`get_json_object` shape) and derives churn labels with CASE/date math
  * [SURVEY §2 legend (chp)].
  *
  * Scale notes: everything here is a built-in Catalyst expression —
  * codegen'd, null-aware, pushdown-friendly. The one deliberate exception
  * is `udf_clamp`, which exists to exercise the Scala-UDF registration
  * surface; its Scaladoc notes the native alternative
  * (`greatest(least(x,hi),lo)`) that a 100 TB hot path should prefer.
  */
object QFunctions extends QueryPack {

  private def fnString(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(
      col("c_custkey"),
      upper(col("c_name")).as("up"),
      lower(col("c_mktsegment")).as("lo"),
      substring(col("c_name"), 1, 8).as("sub"),
      lpad(col("c_name"), 22, "*").as("pad"),
      concat(col("c_name"), lit("-"), col("c_mktsegment")).as("cat"),
      regexp_replace(col("c_name"), "Customer", "Cust").as("rep"),
      length(col("c_name")).as("len"),
      element_at(split(col("c_name"), "#"), 2).as("idpart"))
      .orderBy("c_custkey")

  private val oFnString =
    """SELECT c_custkey, upper(c_name) AS up, lower(c_mktsegment) AS lo,
      |  substr(c_name, 1, 8) AS sub, lpad(c_name, 22, '*') AS pad,
      |  c_name || '-' || c_mktsegment AS cat,
      |  replace(c_name, 'Customer', 'Cust') AS rep,
      |  CAST(length(c_name) AS INT) AS len,
      |  string_split(c_name, '#')[2] AS idpart
      |FROM customer ORDER BY c_custkey""".stripMargin

  private def fnRegex(s: SparkSession, d: String): DataFrame =
    t(s, d, "part").select(
      col("p_partkey"),
      regexp_extract(col("p_name"), "^([a-z]+) ", 1).as("color"),
      regexp_replace(col("p_name"), " ", "_").as("snake"),
      col("p_type").rlike("^(PRO|ECO)").as("is_promo_eco"))
      .filter(col("p_name").rlike("^(red|blue) "))
      .orderBy("p_partkey")

  private val oFnRegex =
    """SELECT p_partkey,
      |  regexp_extract(p_name, '^([a-z]+) ', 1) AS color,
      |  regexp_replace(p_name, ' ', '_', 'g') AS snake,
      |  regexp_matches(p_type, '^(PRO|ECO)') AS is_promo_eco
      |FROM part WHERE regexp_matches(p_name, '^(red|blue) ')
      |ORDER BY p_partkey""".stripMargin

  private def fnDatetime(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").orderBy("o_orderkey").select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("y"),
      month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("dd"),
      date_trunc("month", col("o_orderdate")).as("mon_start"),
      date_add(col("o_orderdate").cast(DateType), 30)
        .cast(TimestampNTZType).as("plus30"),
      datediff(lit("1999-01-01").cast(DateType),
        col("o_orderdate").cast(DateType)).as("days_to_99"),
      unix_timestamp(col("o_orderdate")).as("epoch_s"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("ymd"))

  private val oFnDatetime =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(month(o_orderdate) AS INT) AS m,
      |  CAST(day(o_orderdate) AS INT) AS dd,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon_start,
      |  CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS plus30,
      |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INT) AS days_to_99,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
      |  strftime(o_orderdate, '%Y-%m-%d') AS ymd
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Math functions. round() is deliberately absent: Spark rounds the
    * shortest-decimal repr, DuckDB the binary value — trunc4 (floor-based)
    * is the cross-engine-stable spelling (see Tables.trunc4). */
  private def fnMath(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").orderBy("l_orderkey", "l_linenumber").select(
      col("l_orderkey"), col("l_linenumber"),
      trunc4(sqrt(col("l_extendedprice"))).as("sq"),
      trunc6(log(col("l_extendedprice"))).as("lg"),
      trunc6(log10(col("l_extendedprice"))).as("lg10"),
      pow(col("l_quantity"), 2).as("qty2"),
      (col("l_linenumber") % 3).as("md"),
      abs(col("l_discount") - 0.05).as("ab"),
      signum(col("l_discount") - 0.03).cast(IntegerType).as("sg"),
      floor(col("l_extendedprice")).as("fl"),
      ceil(col("l_extendedprice")).as("ce"))

  private val oFnMath =
    s"""SELECT l_orderkey, l_linenumber,
       |  ${oTrunc4("sqrt(l_extendedprice)")} AS sq,
       |  ${oTrunc6("ln(l_extendedprice)")} AS lg,
       |  ${oTrunc6("log10(l_extendedprice)")} AS lg10,
       |  pow(l_quantity, 2) AS qty2,
       |  l_linenumber % 3 AS md,
       |  abs(l_discount - 0.05) AS ab,
       |  CAST(sign(l_discount - 0.03) AS INT) AS sg,
       |  CAST(floor(l_extendedprice) AS BIGINT) AS fl,
       |  CAST(ceil(l_extendedprice) AS BIGINT) AS ce
       |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** CASE WHEN churn-label shape + coalesce/nullif/greatest/least. */
  private def fnConditional(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders").orderBy("o_orderkey").select(
      col("o_orderkey"),
      when(col("o_totalprice") > 300000.0, "high")
        .when(col("o_totalprice") > 100000.0, "mid")
        .otherwise("low").as("bucket"),
      coalesce(expr("nullif(o_orderstatus, 'O')"), lit("open")).as("st"),
      greatest(col("o_totalprice"), lit(150000.0)).as("hi"),
      least(col("o_totalprice"), lit(150000.0)).as("lo"))

  private val oFnConditional =
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice > 300000.0 THEN 'high'
      |       WHEN o_totalprice > 100000.0 THEN 'mid' ELSE 'low' END AS bucket,
      |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS st,
      |  greatest(o_totalprice, 150000.0) AS hi,
      |  least(o_totalprice, 150000.0) AS lo
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Sort-before-project: the range partitioner samples the sort keys by
    * executing its child plan, so projecting first would run the parse/cast
    * chain twice (sample pass + real pass) and shuffle the wide derived
    * strings; sorting the raw scan first computes each expression once,
    * after the exchange. Same applies to every expensive map-only query. */
  private def fnCastTypes(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").orderBy("l_orderkey", "l_linenumber").select(
      col("l_orderkey"), col("l_linenumber"),
      money(col("l_extendedprice")).cast(StringType).as("dec_str"),
      col("l_linenumber").cast(LongType).as("ln_big"),
      date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
      to_timestamp(date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss"))
        .cast(TimestampNTZType).as("ts_back"),
      col("l_quantity").cast(IntegerType).as("qty_int"))

  private val oFnCastTypes =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR) AS dec_str,
      |  CAST(l_linenumber AS BIGINT) AS ln_big,
      |  strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS ts_str,
      |  strptime(strftime(l_shipdate, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S')::TIMESTAMP AS ts_back,
      |  CAST(l_quantity AS INT) AS qty_int
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  private def fnArray(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_toks"),
        element_at(col("toks"), 1).as("first_tok"),
        element_at(col("toks"), 3).as("third_tok"),
        array_contains(col("toks"), "scan").as("has_scan"),
        array_join(slice(col("toks"), 1, 5), " ").as("first5"),
        element_at(array_sort(col("toks")), 1).as("min_tok"))
      .orderBy("doc_id")

  private val oFnArray =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |SELECT doc_id, CAST(len(toks) AS INT) AS n_toks,
      |  toks[1] AS first_tok, toks[3] AS third_tok,
      |  list_contains(toks, 'scan') AS has_scan,
      |  array_to_string(toks[1:5], ' ') AS first5,
      |  list_sort(toks)[1] AS min_tok
      |FROM d ORDER BY doc_id""".stripMargin

  /** Map build + extract; output scalars only (map-typed parquet columns
    * don't hash-compare across engines — SURVEY §2.8). */
  private def fnMap(s: SparkSession, d: String): DataFrame =
    t(s, d, "events").orderBy("event_id")
      .withColumn("m", map(lit("et"), col("event_type"),
        lit("uid"), col("user_id").cast(StringType)))
      .select(col("event_id"),
        element_at(col("m"), "et").as("m_et"),
        element_at(col("m"), "uid").as("m_uid"),
        size(col("m")).as("m_size"))

  private val oFnMap =
    """WITH e AS (SELECT event_id,
      |  MAP {'et': event_type, 'uid': CAST(user_id AS VARCHAR)} AS m FROM events)
      |SELECT event_id, m['et'][1] AS m_et, m['uid'][1] AS m_uid,
      |  CAST(cardinality(m) AS INT) AS m_size
      |FROM e ORDER BY event_id""".stripMargin

  /** The GA raw-JSON parse shape: extract a typed field from a JSON string. */
  private def fnJson(s: SparkSession, d: String): DataFrame =
    t(s, d, "events").orderBy("event_id").select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))

  private val oFnJson =
    """SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k
      |FROM events ORDER BY event_id""".stripMargin

  private def fnStruct(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .withColumn("sc", struct(col("c_name").as("name"), col("c_acctbal").as("bal")))
      .select(col("c_custkey"),
        col("sc").getField("name").as("sname"),
        col("sc").getField("bal").as("sbal"))
      .orderBy("c_custkey")

  private val oFnStruct =
    """WITH c AS (SELECT c_custkey,
      |  struct_pack(name := c_name, bal := c_acctbal) AS sc FROM customer)
      |SELECT c_custkey, sc.name AS sname, sc.bal AS sbal
      |FROM c ORDER BY c_custkey""".stripMargin

  /** Scala UDF registration surface. At 100 TB prefer the pure-Column
    * spelling greatest(least(x,hi),lo) — codegen'd, no serialization; this
    * key exists to prove the extension point works. */
  private def udfClamp(s: SparkSession, d: String): DataFrame = {
    val clamp = udf((v: Double) => math.max(0.0, math.min(100.0, v)))
    t(s, d, "events").orderBy("event_id").select(
      col("event_id"), clamp(col("value")).as("clamped"))
  }

  private val oUdfClamp =
    """SELECT event_id, greatest(least(value, 100.0), 0.0) AS clamped
      |FROM events ORDER BY event_id""".stripMargin

  val queries: Map[String, QFn] = Map(
    "fn_string"      -> fnString _,
    "fn_regex"       -> fnRegex _,
    "fn_datetime"    -> fnDatetime _,
    "fn_math"        -> fnMath _,
    "fn_conditional" -> fnConditional _,
    "fn_cast_types"  -> fnCastTypes _,
    "fn_array"       -> fnArray _,
    "fn_map"         -> fnMap _,
    "fn_json"        -> fnJson _,
    "fn_struct"      -> fnStruct _,
    "udf_clamp"      -> udfClamp _)

  val oracles: Map[String, String] = Map(
    "fn_string"      -> oFnString,
    "fn_regex"       -> oFnRegex,
    "fn_datetime"    -> oFnDatetime,
    "fn_math"        -> oFnMath,
    "fn_conditional" -> oFnConditional,
    "fn_cast_types"  -> oFnCastTypes,
    "fn_array"       -> oFnArray,
    "fn_map"         -> oFnMap,
    "fn_json"        -> oFnJson,
    "fn_struct"      -> oFnStruct,
    "udf_clamp"      -> oUdfClamp)
}
