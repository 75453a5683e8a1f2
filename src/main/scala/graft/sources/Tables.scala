package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table loading + cross-engine determinism helpers shared by every query.
  *
  * Provenance: SURVEY.md §1.2 (measured schemas), Appendix A (determinism
  * rules). The reference (Morphl-AI/MorphL-Community-Edition) stores rows in
  * Cassandra and processes them as Spark DataFrames [SURVEY §1.1]; our engine
  * reads columnar parquet straight into DataFrames so Catalyst gets
  * pushdown/pruning for free.
  *
  * Scale notes (100 TB): all helpers are pure `Column` expressions — they stay
  * inside whole-stage codegen and never force a UDF/driver roundtrip. Decimal
  * fixed-point is used for every SUM so results are independent of partition
  * count and reduce order (FP addition is not associative; exact decimal is),
  * which is what makes the same query hash-identical at local[32] and on a
  * 1000-executor cluster.
  */
object Tables {

  /** Load one of the driver-provided parquet tables (TESTDATA.md).
    *
    * `events.parquet` has shipped with two physical encodings of the same
    * logical `ts` column across testdata generations:
    *   - TIMESTAMP(NANOS): Spark's vectorized reader surfaces it as raw
    *     BIGINT nanos (with legacy.parquet.nanosAsLong=true, set at session
    *     build by every entry point); we rebuild a TIMESTAMP_NTZ at micro
    *     precision (lossless: values are microsecond-aligned).
    *   - TIMESTAMP_MICROS (isAdjustedToUTC=false): Spark reads it natively
    *     as TIMESTAMP_NTZ (or TIMESTAMP under older session defaults); we
    *     just normalize to NTZ.
    * A lake engine must tolerate benign physical re-encodings of the same
    * logical schema, so we branch on the *actual read schema* rather than
    * assuming one encoding. NTZ matches the naive timestamps DuckDB and the
    * other tables use.
    */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType => // legacy TIMESTAMP(NANOS) read as raw nanos
          raw.withColumn("ts",
            expr("timestamp_micros(ts div 1000)").cast(TimestampNTZType))
        case TimestampNTZType => raw
        case _: TimestampType =>
          raw.withColumn("ts", col("ts").cast(TimestampNTZType))
        case other =>
          throw new IllegalStateException(
            s"events.ts has unsupported physical type $other")
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  val D184: DecimalType = DecimalType(18, 4)
  val D122: DecimalType = DecimalType(12, 2)
  val D42: DecimalType  = DecimalType(4, 2)
  val D384: DecimalType = DecimalType(38, 4)
  val D386: DecimalType = DecimalType(38, 6)

  /** Fixed-point cast for order-independent exact sums (SURVEY App. A r2). */
  def dec4(c: Column): Column = c.cast(D184)

  /** Money columns in this dataset are true 2-dp values stored as double. */
  def money(c: Column): Column = c.cast(D122)

  /** Exact decimal SUM (order-independent), emitted as DOUBLE: both engines
    * convert the exact decimal to the nearest double identically (verified:
    * DuckDB's decimal->double cast is correctly rounded even past 2^53
    * scaled), and double columns materialize identically through every
    * parquet/pandas path — DECIMAL output columns do not. */
  def sum4(c: Column): Column = sum(dec4(c)).cast(DoubleType)

  /** Truncate a double to 4dp. Unlike round(), floor() on the *same* double
    * bits gives the same answer in Spark (Math.floor) and DuckDB (std::floor)
    * — round() diverges because Spark rounds the shortest decimal repr
    * (BigDecimal via Double.toString) while DuckDB rounds the binary value.
    */
  def trunc4(c: Column): Column = floor(c * lit(10000)) / lit(10000.0)

  def trunc6(c: Column): Column = floor(c * lit(1000000)) / lit(1000000.0)

  /** Deterministic mean: exact decimal sum -> double -> truncate. */
  def avg4(c: Column): Column =
    trunc4(sum(dec4(c)).cast(DoubleType) / count(lit(1)))

  // ---- Oracle-side (DuckDB SQL) twins of the helpers above ----

  def oSum4(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE)"

  def oAvg4(x: String): String =
    s"floor(CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE)/count(*)*10000)/10000.0"

  def oTrunc4(x: String): String = s"floor(($x)*10000)/10000.0"

  def oTrunc6(x: String): String = s"floor(($x)*1000000)/1000000.0"

  /** Exact revenue term: price * (1 - discount), all decimal, scale 4. */
  def revenue: Column =
    (money(col("l_extendedprice")) * (lit(1) - col("l_discount").cast(D42)))

  val oRevenue: String =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"

  /** price * (1-disc) * (1+tax): true scale 6, kept exact end-to-end. */
  def charge: Column =
    revenue * (lit(1) + col("l_tax").cast(D42))

  val oCharge: String = s"$oRevenue * (1 + CAST(l_tax AS DECIMAL(4,2)))"
}
