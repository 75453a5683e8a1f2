package graft

import org.apache.spark.sql.functions._

/** Gates for the round-5 eighth wave (QRound5h): the Spark-4 SQL
  * surfaces — VARIANT typed extraction, pipe-syntax plan equivalence,
  * and collation-aware grouping. */
class Round5hSpec extends SparkSpec {
  import spark.implicits._

  test("fn_json_variant: variant extraction equals from_json on every row") {
    val ev = sources.Tables.t(spark, sf, "events")
    val viaVariant = ev.select(col("event_id"),
      expr("variant_get(parse_json(props), '$.k', 'int')").as("k"))
    val viaSchema = ev.select(col("event_id"),
      expr("from_json(props, 'k INT').k").as("k"))
    // null-safe comparison: a plain =!= is NULL (filtered out) when either
    // side is NULL — exactly the lenient-vs-strict parse divergence this
    // gate exists to catch
    val diff = viaVariant.join(viaSchema, "event_id")
      .filter(!(viaVariant("k") <=> viaSchema("k"))).count()
    assert(diff === 0L, "variant_get disagrees with from_json")
    assert(viaVariant.filter(col("k").isNull).count() === 0L,
      "payloads must all carry an int k")
  }

  test("sql_pipe_syntax: pipe spelling builds the same result as classic SQL") {
    val out = SparkEntry.queries("sql_pipe_syntax")(spark, sf)
    sources.Tables.t(spark, sf, "lineitem").createOrReplaceTempView("g_lineitem")
    val classic = spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
        |    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price
        |FROM g_lineitem
        |WHERE l_shipdate < TIMESTAMP '2001-01-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    assert(out.columns.toSeq === classic.columns.toSeq,
      "pipe and classic spellings must emit the same schema")
    assert(out.collect().toSeq === classic.collect().toSeq,
      "pipe and classic spellings must emit identical rows")
  }

  test("fn_collation_ci: case variants merge; binary grouping would not") {
    val out = SparkEntry.queries("fn_collation_ci")(spark, sf)
    val nSources = sources.Tables.t(spark, sf, "documents")
      .select("source").distinct().count()
    assert(out.count() === nSources,
      "collated grouping must merge the upper/lower case variants")
    // the binary (non-collated) grouping sees ~2x the keys — proves the
    // collation, not the injection, did the merging
    val binaryGroups = sources.Tables.t(spark, sf, "documents")
      .withColumn("src_cased",
        when(expr("(doc_id div 20) % 2") === 1, upper(col("source")))
          .otherwise(col("source")))
      .select("src_cased").distinct().count()
    assert(binaryGroups > nSources,
      "case injection produced no variants — the gate is vacuous")
    // totals conserve
    val total = out.agg(sum("n_docs")).as[Long].head()
    assert(total === sources.Tables.t(spark, sf, "documents").count())
  }
}
