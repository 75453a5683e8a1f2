package graft

/** Plan-shape assertions: the scale posture (SURVEY §4) is only real if the
  * physical plan shows it — pushdown reaching the scan, pruned read schema,
  * broadcast joins where dimensions are small. */
class PlanSpec extends SparkSpec {

  private def plan(key: String): String =
    SparkEntry.queries(key)(spark, sf).queryExecution.executedPlan.toString

  test("filter is pushed down to the parquet scan") {
    val p = plan("scan_filter_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      s"no pushed filter in:\n$p")
  }

  test("projection prunes the read schema to selected columns") {
    val p = plan("scan_project_prune")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice"), s"unpruned scan: $readSchema")
  }

  test("star join broadcasts the dimension tables") {
    val p = plan("join_broadcast_dim")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
  }

  test("theta join keeps a composite equi-key (no pure cartesian)") {
    val p = plan("join_theta_range")
    assert(!p.contains("CartesianProduct"), s"cartesian product in:\n$p")
    // the size-bucket component must be part of the join key, not a residual
    assert(p.contains("tb"), s"bucket key missing from join in:\n$p")
  }

  test("centroid aggregates before any Generate (no 64x explode shuffle)") {
    val p = plan("emb_centroid")
    val gen = p.indexOf("Generate")
    val agg = p.indexOf("ObjectHashAggregate")
    assert(agg >= 0, s"no aggregate in:\n$p")
    assert(gen >= 0 && gen < agg,
      s"Generate must sit above the aggregate (post-agg reshape only) in:\n$p")
  }

  test("q1 aggregates with partial (map-side) combine") {
    val p = plan("agg_group_q1")
    assert(p.contains("HashAggregate"), p)
    // partial + final pair => two HashAggregate operators
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("top-k uses TakeOrderedAndProject, not a full sort") {
    val p = plan("limit_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("simhash pair mining never falls back to a cartesian/BNL join") {
    val p = plan("dedup_simhash_pairs")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"BNLJ in:\n$p")
  }

  test("salted join keys on (user_id, salt), not a broadcast replicate") {
    val p = plan("join_skew_salted")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    assert(p.contains("salt"), s"salt missing from join key in:\n$p")
  }

  test("lang detect plan is scan -> project -> sort (no shuffle before sort)") {
    val p = plan("text_lang_detect")
    assert(!p.contains("HashAggregate"), s"unexpected aggregate in:\n$p")
    assert(!p.contains("Join"), s"unexpected join in:\n$p")
  }

  test("hive-partitioned write, then partition-pruned read") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_part_").toString
    graft.sources.Tables.t(spark, sf, "orders")
      .withColumn("status", col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("status").parquet(dir)
    val scan = spark.read.parquet(dir).filter(col("status") === "F")
    val p = scan.queryExecution.executedPlan.toString
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("status") && pf.contains("= F"),
      s"no partition pruning in: $pf")
    val expected = graft.sources.Tables.t(spark, sf, "orders")
      .filter(col("o_orderstatus") === "F").count()
    assert(scan.count() === expected)
  }

  test("custom as-of plans AsofLookupExec with no window or union") {
    val p = plan("join_asof_custom")
    assert(p.contains("AsofLookup"), s"custom exec missing from:\n$p")
    assert(!p.contains("Window"), s"window fallback in:\n$p")
    assert(!p.contains("Union"), s"union fallback in:\n$p")
  }

  test("stream-stream join batch form is a single equi-join with range residual") {
    for (key <- Seq("stream_stream_join", "stream_stream_left")) {
      val p = plan(key)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$key: non-equi fallback in:\n$p")
    }
  }

  test("interval-bucket join is equi on (user_id, bucket) — no range-only theta") {
    val p = plan("join_interval_bucket")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi fallback in:\n$p")
    assert(p.contains("bucket"), s"bucket key missing from join in:\n$p")
  }

  test("funnel stage joins never fall back to non-equi") {
    val p = plan("chp_funnel_steps")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi fallback in:\n$p")
  }

  test("column profile: per-column agg branches unioned, no join or reshape") {
    val p = plan("profile_columns")
    // union-of-branches spelling: each branch is scan -> partial/final agg
    // on a single pruned column; no join, no stack/Expand reshape shuffle
    assert(!p.contains("Join"), s"unexpected join in:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"no partial+final aggregate pair in:\n$p")
  }

  test("stratified hash sample is a single-pass aggregate (no sample/RNG op)") {
    val p = plan("sample_stratified_hash")
    assert(!p.contains("Sample"), s"RNG Sample operator in:\n$p")
    assert(!p.contains("Join"), s"unexpected join in:\n$p")
  }

  test("bloom-pruned join: dim filter pushed to the scan, dim broadcast") {
    val p = plan("join_bloom_prune")
    assert(p.contains("PushedFilters: [IsNotNull(s_acctbal), GreaterThan(s_acctbal"),
      s"dim filter not pushed in:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"dim not broadcast in:\n$p")
  }

  test("schema-merge read surfaces the evolved column in the merged schema") {
    val p = plan("scan_schema_merge")
    val readSchemas = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchemas.contains("o_orderstatus"),
      s"merged schema lost the evolved column: $readSchemas")
  }

  test("variant extraction prunes the scan to (event_type, props)") {
    val p = plan("fn_json_variant")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("props") && readSchema.contains("event_type"))
    assert(!readSchema.contains("value") && !readSchema.contains("user_id"),
      s"unpruned scan under variant parse: $readSchema")
  }

  test("pipe syntax plans the same one-scan partial aggregate as classic SQL") {
    val p = plan("sql_pipe_syntax")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg pair in:\n$p")
    assert(!p.contains("Join"), s"pipe spelling grew a join:\n$p")
  }

  test("triangle enumeration: both joins broadcast; probe key is a single long") {
    // the shared enumeration is memoized+checkpointed (r11: one build
    // feeds triangle_count AND local_bridges), so the shape assert runs
    // on the RAW builder dataflow — the plan that materializes the memo;
    // post-memo key plans show only the checkpoint scan.
    val p = operators.QRound5c.triCountsBuild(spark, sf)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"triangle enumeration joins must broadcast in:\n$p")
    assert(!p.contains("SortMergeJoin"), s"wedge stream got shuffled in:\n$p")
  }

  private def withDegradeConfs[T](body: => T): T = {
    val confs = Seq("graft.triangle.broadcastMaxEdges",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = confs.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("graft.triangle.broadcastMaxEdges", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      body
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("triangle count: survives past the broadcast ceiling (shuffle-join degrade)") {
    // VERDICT r5/r6: an unconditional O(E) broadcast dies at a 100x corpus
    // instead of degrading. Force the ceiling to 0 edges and broadcast off
    // (plan-level AND AQE-level thresholds): the identical dataflow must
    // re-plan as sort-merge joins and produce the identical result. The
    // enumeration memo keys on the ceiling conf, so this rerun genuinely
    // re-executes the degrade dataflow, not the broadcast-path cache.
    val expected = SparkEntry.queries("graph_triangle_count")(spark, sf)
      .collect().toSeq
    withDegradeConfs {
      val df = SparkEntry.queries("graph_triangle_count")(spark, sf)
      assert(df.collect().toSeq === expected,
        "degrade path disagrees with the broadcast path")
      // both enumeration joins (wedge middle + packed closing probe) must
      // re-plan as sort-merge — asserted on the raw builder dataflow (the
      // key's own plan reads the memoized checkpoint). NOTE the builder
      // plan also embeds the cached edge BUILD's InMemoryRelation subtree,
      // frozen from when the memo materialized it under default confs — so
      // asserting zero BroadcastHashJoin anywhere would false-fail on that
      // frozen subtree; two SMJs proves the enumeration itself degraded.
      val p = operators.QRound5c.triCountsBuild(spark, sf)
        .queryExecution.executedPlan.toString
      assert("SortMergeJoin".r.findAllIn(p).size >= 2,
        s"enumeration joins did not degrade to sort-merge in:\n$p")
    }
  }

  test("local bridges: degrade path returns the identical row") {
    // VERDICT r10 #2b: the docstring's claimed gate, now real — past the
    // broadcast ceiling graph_local_bridges must consume the shuffle-join
    // enumeration and return the exact same tally row.
    val expected = SparkEntry.queries("graph_local_bridges")(spark, sf)
      .collect().toSeq
    withDegradeConfs {
      val out = SparkEntry.queries("graph_local_bridges")(spark, sf)
        .collect().toSeq
      assert(out === expected,
        "local_bridges degrade path disagrees with the broadcast path")
    }
  }

  test("substring dedup: scan prunes to (doc_id, text); no cartesian anywhere") {
    val p = plan("text_dedup_substring")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"),
      s"expected doc_id+text in scan: $readSchema")
    assert(!readSchema.contains("n_chars") && !readSchema.contains("source"),
      s"unpruned documents scan: $readSchema")
    assert(!p.contains("CartesianProduct"),
      s"shingle match degenerated to a cartesian in:\n$p")
  }

  test("theta range: forced prefix-sum rewrite is join-free and agrees with enumeration") {
    // VERDICT r7: the pair enumeration is quadratic by semantics (fixed
    // brand cardinality), so past the pair budget the count/gap-sum
    // aggregate must route through the prefix-sum spelling — a plan with
    // NO join, making pair blowup structurally impossible.
    val k = "graft.thetaRange.enumMaxPairs"
    val saved = spark.conf.getOption(k)
    val expected = SparkEntry.queries("join_theta_range")(spark, sf)
      .collect().toSeq
    try {
      spark.conf.set(k, "0")
      val df = SparkEntry.queries("join_theta_range")(spark, sf)
      assert(df.collect().toSeq === expected,
        "prefix-sum rewrite disagrees with the enumeration path")
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Join"), s"rewrite path still plans a join:\n$p")
      assert(p.contains("Window"), s"rewrite path lost its window stage:\n$p")
    } finally {
      saved match {
        case Some(v) => spark.conf.set(k, v); case None => spark.conf.unset(k)
      }
    }
  }

  test("no unpartitioned window anywhere in the declared inventory") {
    // VERDICT r4: an unpartitioned Window (e.g. a global ntile) funnels
    // EVERY input row through one task — the one plan shape that cannot
    // survive a 100x scale-up. Checked on the optimized logical plan (the
    // physical plan hides inside AdaptiveSparkPlanExec under AQE). This
    // also guards future keys: any global ranking must be spelled as
    // bounded-histogram/breakpoint broadcast instead.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filter { key =>
      val lp = SparkEntry.queries(key)(spark, sf).queryExecution.optimizedPlan
      lp.collect { case w: LWindow if w.partitionSpec.isEmpty => w }.nonEmpty
    }
    assert(offenders.isEmpty, s"global single-partition window in: $offenders")
  }

  test("weighted reservoir sample is a distributed top-k, not a global sort") {
    val p = plan("sample_reservoir_weighted")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k not TakeOrderedAndProject in:\n$p")
  }

  test("KM triangular joins are bounded broadcasts, never cartesian") {
    val p = plan("chp_survival_km")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    // the two cumulative joins over the ~80-row KM table must be broadcast
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"bounded triangular join missing from:\n$p")
  }

  test("mget never shuffles the bucketed store: request list broadcasts") {
    val p = plan("serve_mget_bucketed")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast probe in:\n$p")
    // the big store side is never exchanged on the probe key — both the
    // semi and anti probes broadcast the 100-row request list instead.
    // (The scan legitimately reports "Bucketed: false (disabled by query
    // planner)": bucketing is a shuffle-avoidance layout, and a broadcast
    // probe needs no distribution at all.)
    assert(!p.contains("Exchange hashpartitioning(user_id"),
      s"store shuffled on the probe key in:\n$p")
  }

  test("graph rounds (BFS, k-core) never fall back to non-equi joins") {
    for (key <- Seq("graph_bfs_distance", "graph_kcore",
        "graph_jaccard_neighbors")) {
      val p = plan(key)
      assert(!p.contains("CartesianProduct"), s"$key: cartesian in:\n$p")
    }
  }

  test("spatial grid join probes on the cell key, never 20xN theta") {
    val p = plan("join_spatial_grid")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    // the 9-cell probe side broadcasts into the bucketed corpus scan
    assert(p.contains("BroadcastHashJoin"), s"no cell equi-join in:\n$p")
  }

  test("null-safe join plans as a hash join, not BNLJ") {
    val p = plan("join_null_safe")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), s"non-equi fallback in:\n$p")
  }

  test("keyset pages are TakeOrderedAndProject, never a global sort") {
    val p = plan("serve_keyset_page")
    assert(p.contains("TakeOrderedAndProject"), s"no top-k in:\n$p")
  }

  test("PMI bounds the pair space with the vocab semi-join before pairing") {
    val p = plan("text_pmi_cooccur")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"vocab not a bounded top-k in:\n$p")
  }

  test("stress/harmonic frontiers stay on vertex-keyed equi-joins") {
    for (key <- Seq("graph_stress_sampled", "graph_harmonic_sampled",
        "graph_clustering_coeff", "graph_hits_scores")) {
      val p = plan(key)
      assert(!p.contains("CartesianProduct"), s"$key: cartesian in:\n$p")
    }
  }
}
