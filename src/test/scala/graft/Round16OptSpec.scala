package graft

import graft.sources.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Optimization-round gates for the 128-bit integer sum rewrite
  * (plans/SumExprs.scala): `sum4`/`avg4`/`sumRevenue`/`sumCharge`/
  * `sumProd8` must be BIT-IDENTICAL to the decimal spellings they
  * replaced — same quantization (the dec4/money/D42 casts), same exact
  * total, same DECIMAL(38,s)→DOUBLE final conversion — at every
  * partition count (the aggregate is associative by construction;
  * 1-vs-4-partition runs exercise the merge path). NULL semantics must
  * match SUM's: empty/all-NULL group → NULL. */
class Round16OptSpec extends SparkSpec {

  private def li = t(spark, sf, "lineitem")

  private def legacySum4(c: org.apache.spark.sql.Column) =
    sum(dec4(c)).cast(DoubleType)

  test("sum4 == legacy decimal sum, per group, bit-identical") {
    val a = li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum4(col("l_quantity")).as("s1"),
        sum4(col("l_extendedprice")).as("s2"),
        sum4(col("l_discount")).as("s3"))
      .orderBy("l_returnflag", "l_linestatus").collect()
    val b = li.groupBy("l_returnflag", "l_linestatus")
      .agg(legacySum4(col("l_quantity")).as("s1"),
        legacySum4(col("l_extendedprice")).as("s2"),
        legacySum4(col("l_discount")).as("s3"))
      .orderBy("l_returnflag", "l_linestatus").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("sumRevenue/sumCharge == legacy decimal product sums") {
    val a = li.groupBy("l_returnflag")
      .agg(sumRevenue.as("r"), sumCharge.as("c"))
      .orderBy("l_returnflag").collect()
    val b = li.groupBy("l_returnflag")
      .agg(sum(revenue).cast(DoubleType).as("r"),
        sum(charge).cast(DoubleType).as("c"))
      .orderBy("l_returnflag").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("sumProd8 == legacy DECIMAL(38,8) moment sums (type and value)") {
    val x = col("l_quantity"); val y = col("l_extendedprice")
    val a = li.groupBy("l_returnflag")
      .agg(sumProd8(x, y).as("sxy"), sumProd8(x, x).as("sxx"))
      .orderBy("l_returnflag")
    val b = li.groupBy("l_returnflag")
      .agg(sum((dec4(x) * dec4(y)).cast(DecimalType(38, 8))).as("sxy"),
        sum((dec4(x) * dec4(x)).cast(DecimalType(38, 8))).as("sxx"))
      .orderBy("l_returnflag")
    assert(a.schema("sxy").dataType == b.schema("sxy").dataType)
    assert(a.collect().toSeq == b.collect().toSeq)
  }

  test("avg4 == legacy avg4 spelling") {
    val a = li.groupBy("l_returnflag")
      .agg(avg4(col("l_quantity")).as("v")).orderBy("l_returnflag").collect()
    val b = li.groupBy("l_returnflag")
      .agg(trunc4(sum(dec4(col("l_quantity"))).cast(DoubleType) /
        count(lit(1))).as("v")).orderBy("l_returnflag").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("partition-count invariance (merge path) and negatives") {
    import spark.implicits._
    // signed values force the 128-bit borrow path through hi-word -1
    val vals = Seq(-3.1234, 2.5, -0.0001, 7.9999, -123456.7891, 0.0)
    val one = vals.toDF("v").repartition(1)
      .agg(sum4(col("v"))).collect().head.getDouble(0)
    val four = vals.toDF("v").repartition(4)
      .agg(sum4(col("v"))).collect().head.getDouble(0)
    val legacy = vals.toDF("v").repartition(3)
      .agg(legacySum4(col("v"))).collect().head.getDouble(0)
    assert(one == four && four == legacy)
  }

  test("NULL semantics: empty and all-NULL groups yield NULL, mixed skips") {
    import spark.implicits._
    val df = Seq((1, Some(1.5)), (1, None), (2, None))
      .toDF("g", "v")
    val got = df.groupBy("g").agg(sum4(col("v")).as("s")).orderBy("g").collect()
    assert(got(0).getDouble(1) == 1.5 && got(1).isNullAt(1))
    val empty = spark.emptyDataFrame.select(lit(1).as("v")).filter(lit(false))
      .agg(sum4(col("v"))).collect().head
    assert(empty.isNullAt(0))
  }

  test("sumProd128 == legacy decimal power sums (c2/c3/c4, type and value)") {
    val cl = cents(col("l_extendedprice"))
    val cl2 = cl * cl
    val c = (money(col("l_extendedprice")) * lit(100))
      .cast(DecimalType(13, 0))
    val c2 = (c * c).cast(DecimalType(38, 0))
    val a = li.groupBy("l_returnflag")
      .agg(sumProd128(cl, cl, 0).as("s2"),
        sumProd128(cl2, cl, 0).as("s3"),
        sumProd128(cl2, cl2, 0).as("s4"))
      .orderBy("l_returnflag")
    val b = li.groupBy("l_returnflag")
      .agg(sum(c2).as("s2"),
        sum((c2 * c).cast(DecimalType(38, 0))).as("s3"),
        sum((c2 * c2).cast(DecimalType(38, 0))).as("s4"))
      .orderBy("l_returnflag")
    assert(a.schema("s3").dataType == b.schema("s3").dataType)
    assert(a.collect().toSeq == b.collect().toSeq)
  }

  test("sumProd128 per-row product past 64 bits (global agg, negatives)") {
    import spark.implicits._
    // 4e9 * 4e9 = 1.6e19 > Long.Max per ROW; include a negative product
    val df = Seq((4000000000L, 4000000000L), (-4000000000L, 4000000000L),
      (3L, 7L)).toDF("a", "b")
    val got = df.agg(sumProd128(col("a"), col("b"), 0)).collect().head
      .getDecimal(0)
    assert(got.toBigInteger.toString == "21")
  }

  test("128-bit accumulator exceeds long range without wrap (hi word real)") {
    import spark.implicits._
    // 4e14 per row * 50k rows = 2e19 unscaled at scale 4 — past Long.Max
    val big = spark.range(0, 50000, 1, 4).select(lit(4.0e10).as("v"))
    val got = big.agg(sum4(col("v"))).collect().head.getDouble(0)
    assert(got == 4.0e10 * 50000)
  }
}
