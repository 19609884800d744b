package graft

/** The nested-loop ban as a WHOLE-SURFACE regression gate: every
  * SparkEntry query's physical plan is checked for BroadcastNestedLoopJoin
  * / CartesianProduct, and the set of queries containing one must equal
  * the reviewed allowlist below exactly. A new operator that accidentally
  * plans a nested loop (the classic 100 TB killer: a theta join that
  * stopped extracting its equi-conjunct, a broadcast that silently became
  * a cross) fails here, not on the cluster.
  *
  * Every allowlisted instance is a PARAMETER-sized build side, audited in
  * PLANS.md: scalar aggregates (corpus counts, edge totals, FK-exists
  * bits, shard offset tables), ≤5-row probe sets (q26 family), the 64-row
  * centroid/codebook tables, or the intentional 5-row dim×dim cartesian
  * (q09c). None grows with fact cardinality.
  */
class PlanHygieneSpec extends SparkSpecBase {

  private val allowed: Set[String] = Set(
    "dedup_embedding_lsh", // checked form: two 1-row contract summaries
    "dedup_minhash_bounded", // checked form: three 1-row contract summaries
    "dq_checks",           // FK-exists scalar bit
    "emb_semdedup_bounded", // checked form: four 1-row contract summaries
    "emb_semdedup_hier",   // checked form: four 1-row contract summaries
    "emb_semdedup_rec",    // checked form: four 1-row contract summaries
    "dq_join_cardinality", // 1-row totals × 1-row top-key join
    "dq_skew_report",      // 1-row bounds/totals/percentiles/top joins
    "emb_hard_negatives",  // scalar corpus stats
    "emb_label_balance",   // 1-row label-cardinality summary
    "emb_quantize_topk",   // codebook scalar + probe row
    "graph_triangles",     // n_edges scalar (×2)
    "layout_range_partition", // 1-row bounds + 1-row boundary array
    "mix_pps_sample",      // P-row shard offset table
    "pipe_train_shards",   // 1-row doc_id bounds + P-row shard offsets
    // (profile_columns_approx left this list in r17: its exact/HLL
    // sides now meet in an 11-row broadcast EQUI-join on col_name)
    // r17 optimization: the q12 checked form split its exact/HLL
    // aggregations (the old profile_columns_approx fix) — 1-row join
    "q12_approx_distinct", // 1-row exact × 1-row HLL summary join
    "q09c_cross",          // intentional 5-row dim×dim cartesian
    "q26_ann_ivf",         // probe row vs centroid table
    "q26_ann_ivfpq",       // probe/top1 rows + ADC codebook state
    "q26_ann_lsh",         // checked form: 1 probe row + 1 exact-top1 row
    "q26_ann_pq",          // probe row vs codebook
    "q26_cosine_topk",     // 1 probe row
    "q26b_topk_multi",     // ≤5 probe rows
    "q26c_filtered_topk",  // 1 probe row
    "sketch_overlap_matrix", // segment-count (5-row) sketch pair join
    "text_bm25",           // 1-row stats (n_docs, avgdl, |q| dfs)
    "text_dsir_select",    // 1-row model totals (tp, tq) vs dim-row counts
    "text_sim_pairs",      // 1-row corpus doc count (idf denominator)
    "text_substring_dedup_hashed", // checked form: 1-row hash_eq summary
    // r17 completing the hashed family: same checked shape — the
    // broadcast side is the 1-row both-directions diff COUNT
    "text_substring_apply_hashed",   // 1-row hash_eq summary
    "text_substring_rewrite_hashed", // 1-row hash_eq summary
    "text_substring_novelty_hashed", // 1-row hash_eq summary
    "text_tfidf",          // 1-row corpus doc count
    "text_vocab_coverage", // 1-row bounds/totals + 3-row cutoff table
    "text_unigram_logprob", // 1-row corpus token count
    "ts_concurrency",      // P-row shard offset table
    "ts_embargo_split",    // 1-row bounds + 1-row boundary scalar
    "ts_watermark_report") // 1-row arrival bounds + 1-row totals

  /** Queries whose optimized plan carries an UNPARTITIONED window — the
    * single-task scale killer — where every instance is a reviewed
    * PARAMETER-SIZED input: a ≤ nShards prefix-sum offset table, a
    * domain-bounded histogram, a grain/cell table, or a pre-aggregated
    * group table. A data-sized global window added anywhere else fails
    * the test below.
    */
  private val allowedGlobalWindow: Set[String] = Set(
    "dq_skew_report",        // count-histogram cum (≤ √n rows) + shard offsets
    "layout_range_partition", // ≤ nShards shard-offset table
    "mix_pps_sample",        // ≤ nShards shard-offset table
    "mix_temperature",       // |sources|-row target table share
    "pipe_train_shards",     // ≤ nShards shard-offset table
    "q14c_ratio_to_report",  // pre-aggregated |groups|-row table
    "text_vocab_coverage",   // count-histogram cums + shard offsets
    "ts_concurrency",        // ≤ nShards shard-offset table
    "ts_embargo_split",      // shard offsets feeding the boundary scalar
    "ts_watermark_report")   // shard carry + ≤121-row lateness histogram

  test("no query plans a data-sized global window outside the reviewed allowlist") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val global = fn(spark, sfDir).queryExecution.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty => w
        }
        if (global.nonEmpty) Some(name) else None
    }.toSet
    val fresh = offenders -- allowedGlobalWindow
    assert(fresh.isEmpty,
      s"NEW unpartitioned-window plans (audit + allowlist or fix): $fresh")
    val stale = allowedGlobalWindow -- offenders
    assert(stale.isEmpty,
      s"allowlist entries no longer planning global windows (prune): $stale")
  }

  test("no query plans a nested loop outside the reviewed allowlist") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val hasNl = plan.contains("BroadcastNestedLoopJoin") ||
          plan.contains("CartesianProduct")
        if (hasNl) Some(name) else None
    }.toSet
    val fresh = offenders -- allowed
    assert(fresh.isEmpty,
      s"NEW nested-loop plans (audit + allowlist or fix): $fresh")
    val stale = allowed -- offenders
    assert(stale.isEmpty,
      s"allowlist entries no longer planning nested loops (prune): $stale")
  }
}
