package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the pairs → clusters stage of a dedup pipeline (and any other
  * entity-resolution grouping).
  *
  * Algorithm: every node starts labeled with its own id; each round sets
  * label(v) := min(label(v), min over in-neighbors u of label(u)) until a
  * fixpoint. Converges in diameter(G) rounds (near-dup components are
  * near-cliques — 2-3 rounds in practice; the "hash-to-min" family,
  * Rastogi et al., trades per-round cost for O(log n) worst-case rounds
  * if ever needed).
  *
  * Scale shape (100 TB): each round is one equi-join (edges ⋈ labels on
  * src — both sides shuffle-partitioned on uniform ids) plus one combining
  * groupBy with map-side partial min; no driver-side graph state, no
  * collect. Convergence detection is one tiny sum aggregate per round:
  * labels only ever decrease, so an unchanged label sum IS the fixpoint —
  * the same cheap model-state materialization k-means does per Lloyd
  * iteration (AnnKMeans.centroids).
  */
object ConnectedComponents {

  /** Label every node reachable from `edges` (cols (src, dst), treated as
    * undirected) with the minimum node id in its component. Returns
    * (id, lab). Nodes not in any edge are absent — callers union/left-join
    * singletons back (their label is their own id). */
  def labels(edgesIn: DataFrame, maxRounds: Int = 20): DataFrame = {
    // materialize the (possibly expensive — e.g. a full LSH pipeline) edge
    // source ONCE, and TRUNCATE its logical lineage (localCheckpoint, not
    // just persist): `next` references `lab` twice (union + join), so with
    // lineage intact round r's logical plan nests 2^r copies of the edge
    // source's tree — persist caches the DATA but Catalyst still analyzes
    // the exponentially growing plan every round (measured: 9 s for round
    // 1 over a 500-edge graph at sf0.1, all of it analysis). Checkpointed,
    // each round's plan is two leaf scans; rounds are ~0.2 s. On a
    // durability-sensitive cluster job use checkpoint() to the reliable
    // store instead — same lineage truncation, survives executor loss.
    val half = edgesIn.select(col("src"), col("dst")).localCheckpoint()
    val edges = half
      .union(half.select(col("dst").as("src"), col("src").as("dst")))
    var lab = edges.select(col("src").as("id")).distinct()
      .withColumn("lab", col("id")).localCheckpoint()
    var prevSum = -1L
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val viaEdge = edges.join(lab.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("lab"))
      val next = lab.select("id", "lab").union(viaEdge)
        .groupBy("id").agg(min("lab").as("lab")).localCheckpoint()
      val labSum = next.agg(sum("lab")).head.getLong(0)
      converged = labSum == prevSum
      prevSum = labSum
      lab.unpersist()
      lab = next
      rounds += 1
    }
    half.unpersist()
    // ADVICE r4: exiting on the round cap would hand callers partially
    // propagated (wrong) labels with no signal — fail loudly instead.
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge within $maxRounds rounds " +
          "(component diameter exceeds the cap); raise maxRounds")
    lab
  }
}
