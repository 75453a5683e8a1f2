package graft

import org.apache.spark.sql.functions._

/** Round-9 wave-31 gates (SURVEY §2.28). */
class Round9afSpec extends SparkSpec {

  test("emb_hamming_topk: hamming ranks agree with a driver-side replay") {
    val out = SparkEntry.queries("emb_hamming_topk")(spark, sf).collect()
    // replay sign codes driver-side from the raw vectors
    val vecs = sources.Tables.t(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray).toMap
    def code(v: Array[Float]): (Long, Long) = {
      var hi = 0L; var lo = 0L
      var i = 0
      while (i < 32) { if (v(i) > 0) hi |= (1L << i); i += 1 }
      while (i < 64) { if (v(i) > 0) lo |= (1L << (i - 32)); i += 1 }
      (hi, lo)
    }
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val probes = Seq(2L, 5L, 13L, 17L, 23L)
    assert(out.map(_.getAs[Long]("qid")).distinct.sorted === probes)
    out.foreach { r =>
      val (qhi, qlo) = code(vecs(r.getAs[Long]("qid")))
      val (chi, clo) = code(vecs(r.getAs[Long]("vec_id")))
      assert(r.getAs[Long]("ham") === ham(qhi, chi) + ham(qlo, clo))
    }
    // per probe: exactly 5 rows ranked 1..5 with non-decreasing distance
    out.groupBy(_.getAs[Long]("qid")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq === (1L to 5L))
      val hams = sorted.map(_.getAs[Long]("ham")).toSeq
      assert(hams === hams.sorted)
    }
  }

  test("graph_bipartite_project: weights replay from capped user sets") {
    val out = SparkEntry.queries("graph_bipartite_project")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Int]("k1") < r.getAs[Int]("k2"))
      assert(r.getAs[Long]("w") >= 3L)
    }
    // replay one edge's weight driver-side through the same md5 cap
    val ui = sources.Tables.t(spark, sf, "events")
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .filter(col("k").isNotNull).distinct().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("k")))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(
        s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val capped: Set[(Long, Int)] = ui.groupBy(_._1).iterator.flatMap {
      case (_, rows) =>
        rows.sortBy { case (uu, k) => (md5hex(s"$uu:$k"), k) }.take(48)
    }.toSet
    val top = out.head
    val (k1, k2) = (top.getAs[Int]("k1"), top.getAs[Int]("k2"))
    val byUser = capped.groupBy(_._1).map { case (u, s) => u -> s.map(_._2) }
    val w = byUser.count { case (_, ks) => ks.contains(k1) && ks.contains(k2) }
    assert(top.getAs[Long]("w") === w.toLong)
  }

  test("profile_benford: shares sum to ~1 and digit 1 dominates") {
    val out = SparkEntry.queries("profile_benford")(spark, sf).collect()
    assert(out.map(_.getAs[Int]("digit")).toSeq.sorted === (1 to 9))
    val n = out.map(_.getAs[Long]("n")).sum
    val li = sources.Tables.t(spark, sf, "lineitem").count()
    assert(n === li)
    val shares = out.map(r =>
      r.getAs[Int]("digit") -> r.getAs[Double]("share")).toMap
    assert(math.abs(shares.values.sum - 1.0) < 1e-2)
    // synthetic uniform-ish prices won't be Benford, but digit extraction
    // must cover the full domain and deviations must be well-formed
    out.foreach { r =>
      assert(r.getAs[Double]("abs_dev") >= 0.0)
      assert(r.getAs[Double]("expected") > 0.0)
    }
  }
}
