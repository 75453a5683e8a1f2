package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables._

/** Guide §1 probe for the iterative graph memo builds (katz/percolation):
  * times each stage of the katz power iteration separately so the 6-9 s
  * build cost is attributable (the co-occurrence graph is only 1.2M
  * edges / 20k nodes — DuckDB enumerates it in 0.13 s, so the cost is
  * plan/shape, not volume). Dev tool, not a surface. */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    def tsec[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"GRAPH $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    if (args.contains("real")) {
      val d2 = d
      tsec("real_coedges") {
        graft.operators.QRound5c.coEdgesMemo(spark, d2).count()
      }
      tsec("real_codir") {
        graft.operators.QRound5c.coDirMemo(spark, d2).count()
      }
      tsec("real_katz_build") {
        graft.operators.QRound9br.katzCentralityBuild(spark, d2)
          .write.format("noop").mode("overwrite").save()
      }
      tsec("real_perc_build") {
        graft.operators.QRound9bz.bootstrapPercolationBuild(spark, d2)
          .write.format("noop").mode("overwrite").save()
      }
      spark.stop()
      return
    }
    // decompose the current coedges spelling
    val op0 = t(spark, d, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    tsec("op_distinct")(op0.write.format("noop").mode("overwrite").save())
    tsec("selfjoin_nodistinct") {
      op0.as("x").join(op0.as("y"), col("x.ok") === col("y.ok"))
        .filter(col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("a"), col("y.pk").as("b"))
        .write.format("noop").mode("overwrite").save()
    }
    tsec("selfjoin_distinct") {
      op0.as("x").join(op0.as("y"), col("x.ok") === col("y.ok"))
        .filter(col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("a"), col("y.pk").as("b"))
        .distinct()
        .write.format("noop").mode("overwrite").save()
    }
    // array-pair spelling: one groupBy + map-side pair explode + distinct
    tsec("arraypairs_distinct") {
      t(spark, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("pks"))
        .select(explode(expr(
          """flatten(transform(pks, (x, i) ->
            |  transform(slice(pks, i + 2, size(pks)), y ->
            |    struct(x AS a, y AS b))))""".stripMargin)).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .distinct()
        .write.format("noop").mode("overwrite").save()
    }
    // r17 probe: key the op distinct by ok ALONE (HashPartitioning(ok)
    // satisfies both the (ok, pk) distinct's clustering AND the
    // self-join's ok clustering), so the dedup and the join share ONE
    // exchange instead of three
    tsec("okkeyed_selfjoin_distinct") {
      val opk = t(spark, d, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .repartition(col("ok")).distinct()
      opk.as("x").join(opk.as("y"), col("x.ok") === col("y.ok"))
        .filter(col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("a"), col("y.pk").as("b"))
        .distinct()
        .write.format("noop").mode("overwrite").save()
    }
    val e = tsec("coedges_build") {
      val x = graft.operators.QRound5c.coEdges(t(spark, d, "lineitem"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      x.count(); x
    }
    val dir = tsec("codir_build") {
      val x = e.select(col("a").as("u"), col("b").as("v"))
        .union(e.select(col("b").as("u"), col("a").as("v")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      x.count(); x
    }
    val dmax = tsec("dmax") {
      dir.groupBy("v").agg(count(lit(1)).as("deg"))
        .agg(max("deg")).collect().head.getLong(0)
    }
    val bigD = dmax + 1L
    var y = tsec("y0") {
      dir.select(col("v").as("node")).distinct()
        .withColumn("y", lit(1L)).localCheckpoint(true)
    }
    var dPow = 1L
    for (r <- 1 to 4) {
      dPow *= bigD
      val dp = dPow
      y = tsec(s"round_$r") {
        val nbr = dir.join(y, col("u") === col("node"))
          .groupBy("v").agg(sum("y").as("nbr_sum"))
        nbr.select(col("v").as("node"), (lit(dp) + col("nbr_sum")).as("y"))
          .localCheckpoint(true)
      }
    }
    tsec("topk") {
      y.orderBy(col("y").desc, col("node")).limit(10).collect()
    }
    // variant: broadcast-hinted state join
    var y2 = dir.select(col("v").as("node")).distinct()
      .withColumn("y", lit(1L)).localCheckpoint(true)
    dPow = 1L
    for (r <- 1 to 4) {
      dPow *= bigD
      val dp = dPow
      y2 = tsec(s"bcast_round_$r") {
        val nbr = dir.join(broadcast(y2), col("u") === col("node"))
          .groupBy("v").agg(sum("y").as("nbr_sum"))
        nbr.select(col("v").as("node"), (lit(dp) + col("nbr_sum")).as("y"))
          .localCheckpoint(true)
      }
    }
    // variant: lazy checkpoint chain, one job at the end
    var y3 = dir.select(col("v").as("node")).distinct()
      .withColumn("y", lit(1L)).localCheckpoint(false)
    dPow = 1L
    val tAll = System.nanoTime()
    for (r <- 1 to 4) {
      dPow *= bigD
      val dp = dPow
      val nbr = dir.join(broadcast(y3), col("u") === col("node"))
        .groupBy("v").agg(sum("y").as("nbr_sum"))
      y3 = nbr.select(col("v").as("node"), (lit(dp) + col("nbr_sum")).as("y"))
        .localCheckpoint(false)
    }
    y3.orderBy(col("y").desc, col("node")).limit(10).collect()
    println(f"GRAPH lazy_4rounds_plus_topk     ${(System.nanoTime() - tAll) / 1e9}%.3f s")
    spark.stop()
  }
}
