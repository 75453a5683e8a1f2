package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gates for the round-5 fourth wave (QRound5d): properties the DuckDB
  * hash-match can't see — hand-computed HOF results, corpus write-safety
  * preconditions, the sign-LSH collision property on true near-dups,
  * Markov row-stochasticity, and FILTER-clause equivalence. */
class Round5dSpec extends SparkSpec {
  import spark.implicits._

  test("fn_lambda_hof: hand-computed vector agrees") {
    val emb = sources.Tables.t(spark, sf, "embeddings")
      .filter(col("vec_id") === 0).select("embedding")
      .as[Array[Float]].head()
    def sl(x: Float): Long = math.floor(x.toDouble * 1e6 + 0.5).toLong
    val scaled = emb.map(sl)
    val row = SparkEntry.queries("fn_lambda_hof")(spark, sf)
      .filter(col("vec_id") === 0).collect()(0)
    assert(row.getAs[Int]("n_pos") === emb.count(_ > 0f))
    assert(row.getAs[Long]("scaled_sum") === scaled.sum)
    assert(row.getAs[Int]("has_big") === (if (emb.exists(x => math.abs(x.toDouble) > 0.5)) 1 else 0))
    assert(row.getAs[Long]("dot_rev_scaled") ===
      scaled.zip(scaled.reverse).map { case (a, b) => a * b }.sum)
  }

  test("scan_text_lines: corpus is line-safe and the roundtrip conserves docs") {
    val docs = sources.Tables.t(spark, sf, "documents")
    val unsafe = docs.filter(col("text").contains("\t") || col("text").contains("\n")).count()
    assert(unsafe === 0L, "corpus has tab/newline chars — line staging would corrupt")
    val out = SparkEntry.queries("scan_text_lines")(spark, sf)
    assert(out.agg(sum("n_docs")).as[Long].head() === docs.count())
    // byte-accuracy: summed text length must match the parquet truth
    val expLen = docs.agg(sum(length(col("text")))).as[Long].head()
    assert(out.agg(sum("sum_len")).as[Long].head() === expLen)
  }

  test("ts_anomaly_zscore: first day of each series has z=0; one cell re-derived") {
    val out = SparkEntry.queries("ts_anomaly_zscore")(spark, sf)
    val firsts = out.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("day_num")))
      .filter(col("rn") === 1)
    assert(firsts.filter(col("z") =!= 0.0).count() === 0L,
      "window of size 1 must yield z=0")
    // re-derive one late cell driver-side from the raw table
    val rows = out.filter(col("event_type") === "click").orderBy("day_num")
      .collect()
    assert(rows.length >= 8, "need at least 8 click days")
    val window7 = rows.slice(rows.length - 7, rows.length).map(_.getAs[Double]("val"))
    val x = window7.last
    val n = window7.length
    val mean = window7.sum / n
    val varr = (window7.map(v => v * v).sum - window7.sum * window7.sum / n) / (n - 1)
    val z = (x - mean) / math.sqrt(math.max(varr, 1e-12))
    val got = rows.last.getAs[Double]("z")
    assert(math.abs(got - z) < 2e-3,
      s"re-derived z $z vs emitted $got") // vals are trunc4'd, so tolerance
  }

  test("sim_ann_hyperplane: near-dup pairs collide far more than random pairs") {
    // the corpus plants no embedding near-dups (max pairwise cosine ~0.6),
    // so build them: 50 base vectors + a copy each with two dims nudged
    // by 1% — cosine ~0.9999. Sign-LSH property: P(same bucket) =
    // (1 - theta/pi)^8, so near-dups collide almost always, random pairs
    // rarely.
    val base = sources.Tables.t(spark, sf, "embeddings")
      .select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().take(50)
    val perturbed = base.map { case (id, v) =>
      val c = v.clone()
      c(0) = c(0) + math.abs(c(0)) * 0.01f + 1e-4f
      c(63) = c(63) - math.abs(c(63)) * 0.01f - 1e-4f
      (id + 100000L, c)
    }
    val fixture = spark.createDataFrame(
      spark.sparkContext.parallelize((base ++ perturbed).toSeq.map {
        case (id, v) => org.apache.spark.sql.Row(id, v.toSeq)
      }),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    val buckets = operators.QRound5d.hyperplaneBuckets(spark, fixture)
      .as[(Long, Long)].collect().toMap
    val collided = base.count { case (id, _) => buckets(id) == buckets(id + 100000L) }
    assert(collided.toDouble / base.length >= 0.8,
      s"only $collided/${base.length} near-dup pairs share a sign bucket")
    // contrast: random base pairs must collide much less often
    val randomPairs = for (i <- base.indices; j <- (i + 1) until base.length)
      yield (base(i)._1, base(j)._1)
    val randomCollided = randomPairs.count { case (a, b) => buckets(a) == buckets(b) }
    assert(randomCollided.toDouble / randomPairs.size < 0.3,
      s"random pairs collide too often (${randomCollided}/${randomPairs.size}) — buckets are degenerate")
  }

  test("chp_markov_prob: full grid, row-stochastic after smoothing") {
    val out = SparkEntry.queries("chp_markov_prob")(spark, sf)
    val v = sources.Tables.t(spark, sf, "events")
      .select("event_type").distinct().count()
    assert(out.count() === v * v, "transition grid is not complete")
    // per-from probabilities sum to 1 (up to trunc4 loss per cell)
    val sums = out.groupBy("from_type").agg(sum("p_smooth").as("s"))
      .select("s").as[Double].collect()
    sums.foreach { s =>
      assert(s <= 1.0 + 1e-9 && s >= 1.0 - v * 1e-4,
        s"row sum $s not stochastic")
    }
    // smoothing floor: unseen transitions carry p > 0
    assert(out.filter(col("p_smooth") <= 0).count() === 0L)
  }

  test("sql_filter_agg: FILTER clause equals the CASE-WHEN spelling") {
    val out = SparkEntry.queries("sql_filter_agg")(spark, sf)
    sources.Tables.t(spark, sf, "lineitem").createOrReplaceTempView("g_lineitem")
    val caseForm = spark.sql(
      """SELECT l_returnflag,
        |  count(*) AS n_all,
        |  count(CASE WHEN l_quantity > 25 THEN 1 END) AS n_bulk,
        |  CAST(SUM(CASE WHEN l_discount > 5e-2
        |    THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DOUBLE) AS rev_discounted,
        |  CAST(SUM(CASE WHEN l_tax = 0
        |    THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DOUBLE) AS rev_taxfree
        |FROM g_lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    assert(out.collect().toSeq === caseForm.collect().toSeq)
  }
}
