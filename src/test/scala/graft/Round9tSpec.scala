package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-19 gates (SURVEY §2.28). */
class Round9tSpec extends SparkSpec {

  test("emb_hubness_stats: planted hub geometry and zero accounting") {
    import spark.implicits._
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("vec_id")
    // 3 lists all point at node 1 (the hub); node 2 named once
    val knn = Seq((3L, 1L), (4L, 1L), (5L, 1L), (3L, 2L))
      .toDF("vec_id", "nbr_id")
    val out = operators.QRound9t.hubnessStats(nodes, knn).collect()
      .map(r => r.getAs[Long]("in_deg") -> r.getAs[Long]("n_nodes")).toMap
    assert(out === Map(0L -> 3L, 1L -> 1L, 3L -> 1L))
    // driver data: node mass conserved across the histogram
    val drv = SparkEntry.queries("emb_hubness_stats")(spark, sf).collect()
    val n = graft.sources.Tables.t(spark, sf, "embeddings").count()
    assert(drv.map(_.getAs[Long]("n_nodes")).sum === n)
  }

  test("maint_partition_overwrite: only the click partition is restated") {
    val drv = SparkEntry.queries("maint_partition_overwrite")(spark, sf)
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("cents_total"))).toMap
    val truth = graft.sources.Tables.t(spark, sf, "events")
      .select(col("event_type"),
        floor(col("value") * lit(1e2) + lit(5e-1)).cast("long").as("cents"))
      .filter(col("event_type") =!= "click" || col("cents") > 5000)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("c"))
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("c"))).toMap
    assert(drv === truth)
    // the restated partition genuinely shrank
    val rawClicks = graft.sources.Tables.t(spark, sf, "events")
      .filter(col("event_type") === "click").count()
    assert(drv("click")._1 < rawClicks)
  }

  test("serve_keyset_page: cursor pages tile the ranked prefix exactly") {
    val drv = SparkEntry.queries("serve_keyset_page")(spark, sf).collect()
    // contiguous ranked prefix: no dups, pages ordered, page sizes <= 20
    val ids = drv.map(_.getAs[Long]("user_id"))
    assert(ids.distinct.length === ids.length)
    val byPage = drv.groupBy(_.getAs[Int]("page"))
    byPage.foreach { case (_, rows) => assert(rows.length <= 20) }
    // page boundaries respect the global (score desc, user_id) order
    val sorted = drv.sortBy(r =>
      (-r.getAs[Double]("score"), r.getAs[Long]("user_id")))
    assert(sorted.map(_.getAs[Int]("page")).sameElements(
      drv.sortBy(r => (r.getAs[Int]("page"), -r.getAs[Double]("score"),
        r.getAs[Long]("user_id"))).map(_.getAs[Int]("page"))))
    val pagesSeen = sorted.map(_.getAs[Int]("page"))
    assert(pagesSeen.zip(pagesSeen.tail).forall { case (a, b) => a <= b },
      "a later page outranks an earlier one")
  }
}
