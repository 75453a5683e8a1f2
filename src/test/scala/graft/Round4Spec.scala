package graft

import org.apache.spark.sql.functions._
import graft.operators.ConnectedComponents

/** Round-4 operator invariants beyond the DuckDB oracle: connected-
  * components correctness on planted graphs and vs an in-memory closure,
  * interval-bucket join == naive range join, funnel stage monotonicity,
  * and hash-sample stability. */
class Round4Spec extends SparkSpec {

  import spark.implicits._

  test("connected components: planted chain + separate pair + transitivity") {
    // chain 1-2-3-4 (no direct 1-3/1-4 edge: forces propagation), island 10-11
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (11L, 10L))
      .toDF("src", "dst")
    val lab = ConnectedComponents.labels(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connected components: matches in-memory transitive closure on LSH pairs") {
    val pairs = SparkEntry.queries("dedup_lsh_pairs")(spark, sf)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // driver-side union-find truth (test-only; fine at spec scale)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(x => x -> find(x)).toMap
    val got = SparkEntry.queries("dedup_cc_cluster")(spark, sf)
      .filter(col("n_cluster") > 1)
      .select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === truth)
  }

  test("cc cluster: every doc appears exactly once; canon iff min of cluster") {
    val out = SparkEntry.queries("dedup_cc_cluster")(spark, sf).collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.length.toLong === nDocs)
    val byCluster = out.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, rows) =>
      assert(rows.map(_.getLong(0)).min === cid, s"cluster $cid min mismatch")
      val canons = rows.filter(_.getInt(2) == 1)
      assert(canons.length === 1 && canons.head.getLong(0) === cid)
      rows.foreach(r => assert(r.getLong(3) === rows.length.toLong))
    }
  }

  test("interval-bucket join == naive range theta join") {
    val ev = graft.sources.Tables.t(spark, sf, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_id"), col("ts").as("c_ts"))
    val naive = p.join(c, Seq("user_id"))
      .filter(col("c_ts") > col("p_ts") &&
        col("c_ts") < col("p_ts") + expr("INTERVAL 1 HOUR"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
        count_distinct(col("c_id")).as("n_clicks"),
        count_distinct(col("p_id")).as("n_windows_hit"))
      .orderBy("user_id").collect()
    val bucketed = SparkEntry.queries("join_interval_bucket")(spark, sf).collect()
    assert(bucketed.toSeq === naive.toSeq)
    assert(naive.nonEmpty, "degenerate: no in-window pairs at this sf")
  }

  test("funnel: stage timestamps strictly increase and match depth") {
    SparkEntry.queries("chp_funnel_steps")(spark, sf).collect().foreach { r =>
      val stages = (1 to 4).map(i => Option(r.get(i)))
      // prefix property: a null stage is never followed by a non-null one
      val firstNull = stages.indexWhere(_.isEmpty) match {
        case -1 => 4
        case i  => i
      }
      assert(stages.drop(firstNull).forall(_.isEmpty), s"gap in funnel: $r")
      assert(r.getInt(5) === firstNull, s"depth mismatch: $r")
      val ts = stages.flatten.map(
        _.asInstanceOf[java.time.LocalDateTime])
      ts.sliding(2).foreach {
        case Seq(a, b) => assert(a.isBefore(b), s"non-monotone funnel: $r")
        case _         =>
      }
    }
  }

  test("stratified hash sample: ~10% per stratum, sample <= total") {
    SparkEntry.queries("sample_stratified_hash")(spark, sf).collect().foreach { r =>
      val (nTotal, nSample) = (r.getLong(1), r.getLong(2))
      assert(nSample <= nTotal)
      val rate = nSample.toDouble / nTotal
      assert(rate > 0.03 && rate < 0.20, s"rate $rate implausible for mod-10")
      assert(r.getDouble(3) <= r.getDouble(4), s"sample sum exceeds total: $r")
    }
  }

  test("scd2: per-user intervals chain without gaps; exactly one current") {
    val rows = SparkEntry.queries("upsert_scd2")(spark, sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (user, versions) =>
      // output is ordered by valid_from: each valid_to must equal the next
      // version's valid_from (contiguous history), last one open+current
      versions.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.get(2) === b.get(1), s"gap in user $user history")
          assert(a.getInt(4) === 0)
        case _ =>
      }
      assert(versions.last.get(2) == null && versions.last.getInt(4) === 1,
        s"user $user: last version must be open and current")
      assert(versions.count(_.getInt(4) == 1) === 1)
    }
    assert(rows.nonEmpty)
  }

  test("retention cohort: matrix conserves the orders fact table") {
    val rows = SparkEntry.queries("chp_retention_cohort")(spark, sf).collect()
    val totalOrders = graft.sources.Tables.t(spark, sf, "orders").count()
    assert(rows.map(_.getLong(3)).sum === totalOrders,
      "n_orders across the matrix must sum to the fact table")
  }

  test("retention cohort: offset 0 exists for every cohort and dominates") {
    val rows = SparkEntry.queries("chp_retention_cohort")(spark, sf).collect()
    val byCohort = rows.groupBy(_.getInt(0))
    byCohort.foreach { case (cohort, rs) =>
      val offsets = rs.map(_.getInt(1))
      assert(offsets.contains(0), s"cohort $cohort missing offset 0")
      assert(offsets.forall(_ >= 0), s"cohort $cohort has negative offset")
    }
  }
}
