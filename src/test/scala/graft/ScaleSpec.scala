package graft

import org.apache.spark.sql.functions._

/** Structural scale behavior (no timing assertions — counts only): when the
  * corpus grows k×, the bucketed candidate generators must grow ~linearly
  * (true near-dup pairs) while the all-pairs comparison space grows k²×.
  * This is the property that separates "works on 60k rows" from "works at
  * 100 TB": an operator whose candidate set tracks N² is dead at scale no
  * matter how fast its kernel is.
  *
  * The 4× corpus is built by unioning perturbed copies (each copy gets a
  * unique suffix token, so copies are near-dups of their original — Jaccard
  * ≈ (s−1)/(s+1) for s-shingle docs — rather than exact dups), written to a
  * temp dir so the declared pipelines run unmodified against it. */
class ScaleSpec extends SparkSpec {

  private lazy val x4dir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_x4_").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val copies = (0 until 4).map { k =>
      docs.select(
        (col("doc_id") + lit(k * 1000000)).as("doc_id"),
        concat(col("text"), lit(s" copytok$k")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    copies.reduce(_ unionByName _).coalesce(4)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("LSH candidates grow ~linearly under 4x corpus, never toward N^2") {
    val n1 = spark.read.parquet(s"$sf/documents.parquet").count()
    val c1 = graft.operators.QText.lshCandidates(spark, sf).count()
    val c4 = graft.operators.QText.lshCandidates(spark, x4dir).count()
    // replica clusters contribute C(4,2)=6 true pairs per original doc plus
    // 4x the original pair set — a generous linear envelope:
    val linearBound = 16 * c1 + 10 * n1
    assert(c4 <= linearBound, s"c4=$c4 exceeds linear envelope $linearBound")
    val allPairs4 = (4 * n1) * (4 * n1 - 1) / 2
    assert(c4 < allPairs4 / 50,
      s"c4=$c4 is not << all-pairs $allPairs4 — candidate set tracks N^2")
  }

  test("simhash band candidates stay << N^2 under 4x corpus") {
    val n1 = spark.read.parquet(s"$sf/documents.parquet").count()
    val c4 = graft.operators.QRound3.simhashCandidates(spark, x4dir).count()
    val allPairs4 = (4 * n1) * (4 * n1 - 1) / 2
    // replica clusters share near-identical sketches, so simhash buckets run
    // larger than LSH's here (measured ~2.2% of all-pairs = 45× reduction);
    // the structural claim is the N² rejection, not a specific constant
    assert(c4 < allPairs4 / 20,
      s"c4=$c4 is not << all-pairs $allPairs4")
  }

  test("the substring df cap suppresses the replica-boilerplate blowup under 4x corpus") {
    // in the replicated corpus every interior shingle is shared by all 4
    // copies (df >= 4) — exactly the hot-boilerplate profile; the uncapped
    // miner pairs every doc with its replicas over its whole length, the
    // capped one must refuse that blowup
    val docs1 = spark.read.parquet(s"$sf/documents.parquet")
    val docs4 = spark.read.parquet(s"$x4dir/documents.parquet")
    val base = graft.operators.QRound7.substringSpans(docs1)
      .select("a_id", "b_id").distinct().count()
    val uncapped = graft.operators.QRound7.substringSpans(docs4)
      .select("a_id", "b_id").distinct().count()
    val capped = graft.operators.QRound7d.substringSpansCapped(docs4)
      .select("a_id", "b_id").distinct().count()
    // replica families alone contribute C(4,2) = 6 pairs per original doc
    val n1 = docs1.count()
    assert(uncapped >= 6 * n1 / 2,
      s"uncapped=$uncapped did not explode — the scenario is vacuous")
    assert(capped < uncapped / 10,
      s"capped=$capped vs uncapped=$uncapped (base=$base): cap did not bound the blowup")
  }

  test("cc clustering converges and respects every LSH edge under 4x corpus") {
    // the replicated corpus multiplies the near-dup graph (replica families
    // are near-cliques) — CC must still converge inside its round cap and
    // place both endpoints of EVERY LSH pair in the same cluster, with the
    // cluster labeled by its minimum member
    val cl = SparkEntry.queries("dedup_cc_cluster")(spark, x4dir)
      .select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = SparkEntry.queries("dedup_lsh_pairs")(spark, x4dir)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "no near-dup pairs on the replicated corpus")
    pairs.foreach { case (a, b) =>
      assert(cl(a) === cl(b), s"edge ($a,$b) split across clusters")
      assert(cl(a) <= a && cl(a) <= b, s"cluster label not a component minimum")
    }
  }

  test("banded simhash recall survives the 4x corpus (planted near-dups found)") {
    // every (original, copy) pair differs by one trailing token — copies of
    // doc d must appear among the Hamming<=3 pairs unless the suffix flips
    // >3 sketch bits; sample a few originals and require their copy pairs
    val pairs = SparkEntry.queries("dedup_simhash_pairs")(spark, x4dir)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = (0L until 20L).count { d =>
      pairs.contains((d, d + 1000000)) || pairs.contains((d, d + 2000000))
    }
    assert(found >= 15,
      s"only $found/20 sampled originals kept their perturbed copies at Hamming<=3")
  }

  test("theta range rejects quadratic pair growth: the 4x corpus routes join-free") {
    // VERDICT r7: brands are fixed-cardinality, so enumerated pairs grow
    // k² under a k× corpus. With the pair budget between the 1× and 4×
    // pair volumes, the 1× corpus may enumerate (bounded theta surface)
    // but the 4× corpus MUST re-route to the join-free prefix-sum plan —
    // and still return the enumeration answer.
    val dir = java.nio.file.Files.createTempDirectory("graft_x4part_").toString
    val p1 = spark.read.parquet(s"$sf/part.parquet")
      .select("p_partkey", "p_brand", "p_size")
    val copies = (0 until 4).map { k =>
      p1.select((col("p_partkey") + lit(k * 10000000)).as("p_partkey"),
        col("p_brand"), col("p_size"))
    }
    copies.reduce(_ unionByName _).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val key = "graft.thetaRange.enumMaxPairs"
    val saved = spark.conf.getOption(key)
    try {
      // exact 1x pair bound is ~700 at sf0.001 (25 brands, G≈8); 4x is
      // ~16x that. 2000 sits strictly between.
      spark.conf.set(key, "2000")
      val routed = SparkEntry.queries("join_theta_range")(spark, dir)
      val pr = routed.queryExecution.executedPlan.toString
      assert(!pr.contains("Join"),
        s"4x corpus exceeded the pair budget but still planned a join:\n$pr")
      spark.conf.set(key, Long.MaxValue.toString)
      val enumerated = SparkEntry.queries("join_theta_range")(spark, dir)
      val pe = enumerated.queryExecution.executedPlan.toString
      assert(pe.contains("Join"), s"forced enumeration lost its join:\n$pe")
      assert(routed.collect().toSeq === enumerated.collect().toSeq,
        "routed prefix-sum result disagrees with enumeration on the 4x corpus")
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
