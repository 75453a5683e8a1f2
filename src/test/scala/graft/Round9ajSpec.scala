package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-35 gates (SURVEY §2.28). */
class Round9ajSpec extends SparkSpec {

  test("graph_ppr_seeds: seeds carry restart mass; only reached nodes") {
    val out = SparkEntry.queries("graph_ppr_seeds")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r => assert(r.getAs[Double]("ppr") > 0.0) }
    // the three smallest graph nodes are the seeds and must be present
    // with at least the restart share (0.15/3, minus trunc8)
    val seedIds = out.map(_.getAs[Long]("doc_id")).sorted.take(3)
    val byId = out.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Double]("ppr")).toMap
    seedIds.foreach { id => assert(byId(id) >= 0.15 / 3 - 1e-8) }
    // personalization: total mass stays well below 1 (teleport is not
    // uniform — unreached nodes get none)
    assert(out.map(_.getAs[Double]("ppr")).sum <= 1.0 + 1e-6)
  }

  test("emb_triplet_mining: labels check out, gap = pos - neg") {
    val out = SparkEntry.queries("emb_triplet_mining")(spark, sf).collect()
    assert(out.length === 20)
    val lab = sources.Tables.t(spark, sf, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    out.foreach { r =>
      val aId = r.getAs[Long]("a_id")
      assert(lab(r.getAs[Long]("pos_id")) === lab(aId))
      assert(lab(r.getAs[Long]("neg_id")) !== lab(aId))
      val gap = math.floor((r.getAs[Double]("pos_sim") -
        r.getAs[Double]("neg_sim")) * 1e4) / 1e4
      assert(r.getAs[Double]("gap") === gap)
      assert(r.getAs[Int]("violation") === (if (gap < 0.2) 1 else 0))
    }
  }

  test("sql_star_except: excluded columns gone, filter holds, sorted") {
    val df = SparkEntry.queries("sql_star_except")(spark, sf)
    assert(df.columns.toSeq ===
      Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"))
    val out = df.collect()
    assert(out.nonEmpty)
    out.foreach { r => assert(r.getAs[Double]("o_totalprice") > 4e5) }
    // ORDER BY ALL: leading column (o_orderkey, unique) is sorted
    val keys = out.map(_.getAs[Long]("o_orderkey")).toSeq
    assert(keys === keys.sorted)
  }
}
