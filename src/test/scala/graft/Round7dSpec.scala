package graft

import org.apache.spark.sql.functions._

/** Gates for the round-7 fourth wave (corpus governance operators). */
class Round7dSpec extends SparkSpec {
  import spark.implicits._

  /** Same split rule as the engine, computed host-side so planted corpora
    * can pick doc_ids that land on the intended side. */
  private def split(docId: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(docId.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if ("012".contains(hex.charAt(0))) "eval" else "train"
  }

  private def corpus(docs: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_r7d_").toString
    docs.map { case (id, t) => (id, "en", t, t.length) }
      .toDF("doc_id", "lang", "text", "n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("text_decontaminate: a planted train passage contaminates the eval doc that contains it, at any offset") {
    // pick ids deterministically on each side of the hash split
    val evalIds = (0L to 200L).filter(split(_) == "eval")
    val trainId = (0L to 200L).find(split(_) == "train").get
    val (evalDirty, evalClean) = (evalIds.head, evalIds(1))
    val passage = (1 to 15).map(i => s"p$i").mkString(" ") // 15 tokens > 13
    val filler = (1 to 20).map(i => s"t$i").mkString(" ")
    val dir = corpus(Seq(
      trainId -> s"$filler $passage",
      // passage sits at a non-zero offset inside the eval doc
      evalDirty -> s"u1 u2 u3 $passage u4 u5 u6 u7 u8 u9 u10 u11 u12 u13",
      evalClean -> (1 to 30).map(i => s"c$i").mkString(" ")))
    val out = SparkEntry.queries("text_decontaminate")(spark, dir)
      .as[(Long, Long, Long, Double, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet === Set(evalDirty, evalClean), "one row per eval doc only")
    val dirty = out(evalDirty)
    // the 15-token passage carries 3 contaminated 13-gram positions
    assert(dirty._3 === 3L, s"expected 3 hits, row was $dirty")
    assert(dirty._5 === 1, "contaminated doc must be flagged")
    val clean = out(evalClean)
    assert(clean._3 === 0L && clean._4 === 0.0 && clean._5 === 0,
      s"clean doc must be unflagged, row was $clean")
  }

  test("text_decontaminate: real corpus — fractions bounded, flags match fractions, train docs absent") {
    val rows = SparkEntry.queries("text_decontaminate")(spark, sf)
      .as[(Long, Long, Long, Double, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, ng, nh, frac, flag) =>
      assert(split(id) == "eval", s"doc $id is not an eval doc")
      assert(nh >= 0 && nh <= ng, s"doc $id: hits $nh out of $ng")
      assert(frac >= 0.0 && frac <= 1.0)
      assert(flag == (if (frac > 0.05) 1 else 0), s"doc $id: flag/frac mismatch")
    }
  }
}
