package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-30 gates (SURVEY §2.28). */
class Round9aeSpec extends SparkSpec {

  test("mm_dominant_colors: planted two-color image ranks exactly") {
    import spark.implicits._
    // 4x3 P6: 8 red pixels (255,0,0 -> code 7*32+0+0=224), 4 blue
    // (0,0,255 -> code 0+0+3=3)
    val px = (Array.fill(8)(Array(255, 0, 0)) ++
      Array.fill(4)(Array(0, 0, 255))).flatten.map(_.toByte)
    val header = "P6\n4 3\n255\n".getBytes("US-ASCII")
    val media = Seq(operators.Multimodal.MediaRow(1L, header ++ px, "ppm"))
      .toDS()
    val out = operators.QRound9ae.dominantColors(media).collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("rank") === 1L)
    assert(out(0).getAs[Long]("code") === 224L)
    assert(out(0).getAs[Long]("cnt") === 8L)
    assert(out(0).getAs[Double]("share") === math.floor(8.0 / 12 * 1e4) / 1e4)
    assert(out(1).getAs[Long]("code") === 3L)
    assert(out(1).getAs[Long]("cnt") === 4L)
  }

  test("serve_knn_lookup: exactly the probes' k lists, labels attached") {
    val out = SparkEntry.queries("serve_knn_lookup")(spark, sf).collect()
    val probes = Set(3L, 7L, 11L, 15L, 19L)
    assert(out.map(_.getAs[Long]("vec_id")).toSet === probes)
    val lab = sources.Tables.t(spark, sf, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    out.foreach { r =>
      assert(r.getAs[Int]("n_label") === lab(r.getAs[Long]("nbr_id")))
    }
    out.groupBy(_.getAs[Long]("vec_id")).foreach { case (_, rows) =>
      val rnks = rows.map(_.getAs[Int]("rnk")).sorted
      assert(rnks === (1 to rnks.length))
    }
  }

  test("pipeline_snapshot_diff: statuses partition both snapshots") {
    val out = SparkEntry.queries("pipeline_snapshot_diff")(spark, sf)
      .collect()
      .map(r => r.getAs[String]("status") -> r.getAs[Long]("n_docs")).toMap
    val docs = sources.Tables.t(spark, sf, "documents")
    val n = docs.count()
    val added = docs.filter(col("doc_id") % 17 === 0).count()
    val removed = docs.filter(col("doc_id") % 19 === 0).count()
    val changed = docs.filter(col("doc_id") % 13 === 0 &&
      col("doc_id") % 17 =!= 0).count()
    assert(out("added") === added)
    assert(out("removed") === removed)
    // upper(text) == text would make a "changed" doc unchanged; the
    // synthetic corpus is lowercase so every %13 doc really changes
    assert(out("changed") === changed)
    assert(out.values.sum === n + removed)
  }

  test("wave-30 keys registered with oracles") {
    Seq("mm_dominant_colors", "serve_knn_lookup", "pipeline_snapshot_diff")
      .foreach { k =>
        assert(SparkEntry.queries.contains(k), s"$k not registered")
        assert(SparkEntry.oracleSql.contains(k), s"$k has no oracle")
      }
  }
}
