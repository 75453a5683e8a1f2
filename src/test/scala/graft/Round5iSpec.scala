package graft

import org.apache.spark.sql.functions._

/** Gates for the round-5 ninth wave (QRound5i): planted sub-document
  * duplication must be found, and truncation retention must be a true
  * norm ratio. */
class Round5iSpec extends SparkSpec {
  import spark.implicits._

  test("text_dedup_paragraph: a planted shared passage is detected") {
    // plant: two synthetic docs sharing an identical 16-token chunk,
    // appended to the real corpus via a temp dir
    val dir = java.nio.file.Files.createTempDirectory("graft_para_").toString
    val docs = sources.Tables.t(spark, sf, "documents")
    val shared = (1 to 16).map(i => s"tok$i").mkString(" ")
    val extra = Seq(
      (900001L, s"$shared unique one tail", "en", "srcX", 0L),
      (900002L, s"$shared other ending words", "en", "srcX", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.unionByName(extra).coalesce(2)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("text_dedup_paragraph")(spark, dir)
    val planted = out.filter(col("doc_id") >= 900001L).collect()
    assert(planted.length === 2)
    planted.foreach { r =>
      assert(r.getAs[Long]("n_dup_chunks") >= 1L,
        s"planted shared chunk not detected for doc ${r.getAs[Long]("doc_id")}")
    }
    // chunk accounting: every doc's chunks = ceil(tokens/16)
    val bad = out.join(
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          ceil(size(split(col("text"), " ")) / 16.0).cast("long").as("exp")),
      "doc_id")
      .filter(col("n_chunks") =!= col("exp")).count()
    assert(bad === 0L, "chunk count disagrees with ceil(tokens/16)")
  }

  test("cross-key invariants: repetition stats and Markov counts agree with their independent twins") {
    // 1. text_repetition_stats.n_tokens must equal text_token_count.n_ws
    //    per doc — two independent spellings of the same tokenization
    val reps = SparkEntry.queries("text_repetition_stats")(spark, sf)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    SparkEntry.queries("text_token_count")(spark, sf)
      .select("doc_id", "n_ws").as[(Long, Int)].collect()
      .foreach { case (id, nws) =>
        assert(reps(id) === nws.toLong, s"token count mismatch for doc $id")
      }
    // 2. chp_markov_prob's transition total must equal chp_action_bigrams'
    //    total count — same per-user lead() chain, independent rollups
    val markovTotal = SparkEntry.queries("chp_markov_prob")(spark, sf)
      .agg(sum("cnt")).as[Long].head()
    val bigramTotal = SparkEntry.queries("chp_action_bigrams")(spark, sf)
      .agg(sum("n")).as[Long].head()
    assert(markovTotal === bigramTotal,
      "Markov grid and action bigrams disagree on the transition count")
  }

  test("emb_matryoshka_trunc: retention bounded in (0,1]; full-prefix is 1") {
    val out = SparkEntry.queries("emb_matryoshka_trunc")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (mn, av, mx) = (r.getAs[Double]("min_ret"),
        r.getAs[Double]("avg_ret"), r.getAs[Double]("max_ret"))
      assert(mn > 0.0 && mx <= 1.0 && mn <= av && av <= mx,
        s"retention ordering broken: $mn / $av / $mx")
    }
    // sanity: retention of the full 64-dim prefix would be exactly 1 —
    // re-derive one vector's 16-dim retention driver-side
    val v = sources.Tables.t(spark, sf, "embeddings")
      .filter(col("vec_id") === 0).select("embedding")
      .as[Array[Float]].head()
    def sl(x: Float): Long = math.floor(x.toDouble * 1e6 + 0.5).toLong
    val ssHead = v.take(16).map(x => sl(x) * sl(x)).sum
    val ssFull = v.map(x => sl(x) * sl(x)).sum
    val expRetS = math.floor(math.sqrt(ssHead.toDouble) /
      math.sqrt(ssFull.toDouble) * 10000).toLong
    val lbl = sources.Tables.t(spark, sf, "embeddings")
      .filter(col("vec_id") === 0).select("label").as[Int].head()
    val row = out.find(_.getAs[Int]("label") == lbl).get
    assert(row.getAs[Double]("min_ret") <= expRetS / 10000.0 &&
      expRetS / 10000.0 <= row.getAs[Double]("max_ret"),
      "vector 0's re-derived retention falls outside its label's min/max")
  }
}
