package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** User-facing extension methods — the ergonomic surface a caller of the
  * library actually writes (`import graft.syntax._`). Each delegates to
  * the operator modules; nothing here adds semantics.
  *
  * {{{
  * import graft.syntax._
  * docs.nearDupPairs(textCol = "text", idCol = "doc_id")      // MinHash+LSH, verified
  * emb.cosineTopK(probe, k = 5)                               // exact ANN baseline
  * clicks.asOf(signups, key = "user_id", ts = "ts", payload = Seq("signup_id"))
  * facts.saltedJoin(dim, key = "k", salt = 8)                 // hot-key skew
  * }}}
  */
package object syntax {

  implicit class GraftTextOps(private val df: DataFrame) {

    /** Verified near-duplicate pairs (shingle Jaccard ≥ thr) via
      * MinHash+LSH candidates. Expects (idCol, textCol) columns.
      */
    def nearDupPairs(textCol: String, idCol: String, thr: Double = 0.7): DataFrame =
      operators.Dedup.minhashLshPairs(
        df.select(col(idCol).as("doc_id"), col(textCol).as("text")), thr)

    /** Deterministic hash split: (bucket, split) by md5(id) mod 100. */
    def hashSplit(idCol: String, trainPct: Int = 90): DataFrame =
      df.withColumn("bucket", operators.TextAnalysis.md5Bucket(col(idCol)))
        .withColumn("split",
          when(col("bucket") < trainPct, "train").otherwise("val"))

    /** TF-IDF top-k terms per document; expects (doc_id, text). */
    def tfidfTopTerms(k: Int = 3): DataFrame =
      operators.TextAnalysis.tfidfTopTermsOf(df, k)

    /** Gopher-style duplicated-3-gram repetition ratio; expects (doc_id, text). */
    def repetitionScore(): DataFrame =
      operators.TextAnalysis.repetitionScoreOf(df)

    /** Mean unigram −ln P(token) quality score; expects (doc_id, text). */
    def unigramLogprob(): DataFrame =
      operators.TextAnalysis.unigramLogprobOf(df)

    /** Token-budget sequence packing; expects (doc_id, lang, text). */
    def packSequences(budget: Int = 512): DataFrame =
      operators.TextAnalysis.packSequencesOf(df, budget)

    /** Asymmetric containment pairs: (i, j) where j holds ≥ num/den of
      * i's shingles — the sub-document duplicate detector. Expects
      * (doc_id, text).
      */
    def containmentPairs(thrNum: Int = 9, thrDen: Int = 10): DataFrame =
      operators.Dedup.containmentOf(df, thrNum, thrDen)

    /** Benchmark decontamination against an eval set via the fixed-size
      * bloom sketch (exact answer: no false negatives + exact confirm).
      * Expects (doc_id, text) on both sides.
      */
    def decontamAgainst(evalSet: DataFrame): DataFrame =
      operators.TextAnalysis.decontamBloomOf(df, evalSet)

    /** Ingest novelty filter: doc_ids of rows NOT already in `snapshot`
      * by exact text, bloom-prefiltered. Expects (doc_id, text).
      */
    def novelAgainst(snapshot: DataFrame): DataFrame =
      operators.Dedup.bloomSnapshotDedupOf(df, snapshot)

    /** Content-defined chunks of a string column — shift-resistant
      * boundaries, ~64-byte expected size.
      */
    def cdcChunks(textCol: String): Column =
      org.apache.spark.sql.GraftSqlShim.column(
        graft.functions.CdcChunks(
          org.apache.spark.sql.GraftSqlShim.expression(col(textCol))))

    /** All-pairs document cosine ≥ tau over the df ≤ dfCap TF-IDF
      * vocabulary (inverted-index posting join — candidate-bounded,
      * never corpus²). Expects (doc_id, text).
      */
    def similarPairs(dfCap: Int = 100, tau: Double = 0.3): DataFrame =
      operators.TextAnalysis.tfidfSimilarPairsOf(df, dfCap, tau)

    /** Reliability diagram + ECE terms for the marker-langid confidence
      * vs the ground-truth `lang` column. Expects (text, lang).
      */
    def calibrationReport(): DataFrame =
      operators.TextAnalysis.calibrationReportOf(df)

    /** Vocabulary coverage curve: per candidate vocab size, the share
      * of token occurrences the top-k types cover. Expects (text).
      */
    def vocabCoverage(cutoffs: Seq[Long], nShards: Int = 32): DataFrame =
      operators.TextAnalysis.vocabCoverageOf(df, cutoffs, nShards)

    /** BM25-ranked top-k docs for a fixed query-term set — single-scan,
      * map-side scoring (no token-stream shuffle). Expects (doc_id, text).
      */
    def bm25TopDocs(query: Seq[String], k: Int = 10): DataFrame =
      operators.TextAnalysis.bm25TopDocsOf(df, query, k)

    /** Train the first n BPE merges (word-frequency formulation —
      * iteration cost is vocab-sized; `batchSize` > 1 applies the
      * top-batchSize symbol-disjoint merges per round, the
      * production-merge-count path). Expects (text).
      */
    def bpeTrain(nMerges: Int, batchSize: Int = 1): DataFrame =
      if (batchSize == 1) operators.TextAnalysis.bpeTrainOf(df, nMerges)
      else operators.TextAnalysis.bpeTrainBatchedOf(df, nMerges, batchSize)

    /** Apply learned BPE merges (rank order) and report per-doc
      * word/char/BPE-token counts + compression. Expects (doc_id, text).
      */
    def bpeEncode(merges: Seq[(String, String)]): DataFrame =
      operators.TextAnalysis.bpeEncodeOf(df, merges)

    /** Linear-classifier quality scoring over hashed token features
      * (CCNet/fastText-style inference; `weights` = (bucket, w) rows,
      * broadcast). Expects (doc_id, text).
      */
    def scoreLinear(weights: DataFrame, dim: Int,
        bias: Double = 0.0): DataFrame =
      operators.TextAnalysis.scoreLinearOf(df, weights, dim, bias)

    /** DSIR importance resampling: top-k docs whose hashed-bigram
      * distribution looks like the `isTarget` slice. Expects
      * (doc_id, text).
      */
    def dsirSelect(isTarget: Column, dim: Int = 256,
        k: Int = 100): DataFrame =
      operators.TextAnalysis.dsirSelectOf(df, isTarget, dim, k)
  }

  implicit class GraftAggOps(private val df: DataFrame) {

    /** Distributed exact interpolated percentiles per key (percentile_cont
      * semantics; survives any group size — see operators.Percentiles).
      */
    def exactPercentiles(keyCol: String, valCol: String,
        ps: Seq[Double]): DataFrame =
      operators.Percentiles.grouped(df, keyCol, valCol, ps)

    /** Per-key EWMA + EW-variance anomaly flags via the secondary-sort
      * segmented scan. Expects (user_id, ts, event_id, value) columns.
      */
    def ewmaScan(alpha: Double = 0.2, z: Double = 3.0): DataFrame =
      operators.TimeSeries.ewmaScanOf(df, alpha, z).toDF()

    /** Mergeable KLL quantile cube at (day, event_type) grain with
      * weekly merged p50/p95. Expects (ts, event_type, value) columns.
      */
    def quantileCube(): DataFrame =
      operators.SketchRollup.quantileRollupOf(df)

    /** Per-key two-sided CUSUM changepoint flags (Page's test) via the
      * secondary-sort segmented scan. Expects (user_id, ts, event_id,
      * value) columns.
      */
    def cusumScan(mu: Double, kappa: Double, h: Double): DataFrame =
      operators.TimeSeries.cusumScanOf(df, mu, kappa, h).toDF()

    /** Exact per-group heavy hitters (items ≥ frac of the group's rows)
      * via one Misra-Gries sketch per group + bounded recount.
      */
    def heavyHittersPerGroup(grpCol: String, itemCol: String,
        frac: Double = 0.01, k: Int = 128): DataFrame =
      operators.HeavyHitters.heavyHittersByGroup(
        df, col(grpCol), col(itemCol), frac, k)

    /** First/last-touch conversion attribution per purchase. Expects
      * (user_id, event_id, event_type, ts) columns.
      */
    def touchAttribution(windowUs: Long = 7L * 24 * 3600 * 1000000L): DataFrame =
      queries.Analytics.touchAttributionOf(df, windowUs)

    /** Join-key skew diagnostic: per-key count distribution stats, the
      * heaviest key, and the max/mean skew ratio — run this before
      * shuffling 100 TB on `keyCol`.
      */
    def skewReport(keyCol: String): DataFrame =
      operators.Quality.skewReport(df, col(keyCol))
  }

  implicit class GraftSamplingOps(private val df: DataFrame) {

    /** Deterministic hash-ring negative sampling over this (u, v) edge
      * list: up to k non-edge candidates per node, RNG-free.
      */
    def negativeSample(k: Int = 3, shardBits: Int = 4): DataFrame =
      operators.Graph.negativeSampleOf(df, k, shardBits)
  }

  implicit class GraftGraphOps(private val df: DataFrame) {

    /** Fixed-iteration PageRank over this (u, v) undirected edge list;
      * returns (n, r). Quantized-decimal contribution sums keep results
      * independent of shuffle order.
      */
    def pageRank(iters: Int = 3, damping: Double = 0.85): DataFrame =
      operators.Graph.pageRank(df, iters, damping)

    /** Triangle census of this (u, v) undirected edge list. */
    def triangleStats(): DataFrame = operators.Graph.triangleStats(df)

    /** Bounded-depth multi-source BFS over this (u, v) undirected edge
      * list; returns (n, dist) = min hop distance from any seed, rows
      * only for vertices reached within maxDepth.
      */
    def bfsFrom(seeds: DataFrame, maxDepth: Int): DataFrame =
      operators.Graph.bfsOf(df, seeds, maxDepth)
  }

  implicit class GraftReconcileOps(private val df: DataFrame) {

    /** Bucketed XOR content fingerprint — cheap first-pass snapshot
      * comparison (buckets × 16 bytes).
      */
    def fingerprint(key: String, cols: Seq[String],
        buckets: Int = 64): DataFrame =
      operators.Reconcile.fingerprint(df, key, cols, buckets)

    /** Added/removed/changed diff vs another keyed snapshot. */
    def diffAgainst(other: DataFrame, key: String,
        cols: Seq[String]): DataFrame =
      operators.Reconcile.tableDiff(df, other, key, cols)

    /** Apply an I/U/D changeset (MERGE semantics) to this snapshot. */
    def applyChanges(changes: DataFrame, key: String,
        cols: Seq[String]): DataFrame =
      operators.Reconcile.applyChanges(df, changes, key, cols)
  }

  implicit class GraftVectorOps(private val df: DataFrame) {

    /** SemDeDup-style semantic dedup over this (vec_id, embedding)
      * frame: k-means cells, within-cell cosine pruning, per-vector
      * kept verdicts. Scale k with the corpus to bound cell size — and
      * pass `maxCell` as the occupancy guardrail so a skewed semantic
      * cluster can never go quadratic (unadmitted vectors are kept;
      * capped drops ⊆ uncapped drops). The cap defaults ON
      * ([[operators.Similarity.DefaultMaxCell]]); pass `None` to opt
      * out of the guardrail explicitly.
      */
    def semDedup(k: Int = 4, iters: Int = 2, thr: Double = 0.4,
        maxCell: Option[Int] =
          Some(operators.Similarity.DefaultMaxCell)): DataFrame = {
      graft.functions.VectorFunctions.register(df.sparkSession)
      operators.Similarity.semDedupOf(df, k, iters, thr, maxCell)
    }

    /** Hierarchical SemDeDup: coarse k-means plus per-cell grouped
      * sub-clustering toward `targetCell`, pair-pruning within REFINED
      * cells; `maxCell` remains the hard backstop for cells no Lloyd's
      * can split (near-identical vectors).
      */
    def semDedupHier(k: Int = 4, iters: Int = 2, thr: Double = 0.4,
        targetCell: Int = 50, maxCell: Option[Int] =
          Some(operators.Similarity.DefaultMaxCell)): DataFrame = {
      graft.functions.VectorFunctions.register(df.sparkSession)
      operators.Similarity.semDedupHierOf(df, k, iters, thr, targetCell,
        maxCell)
    }

    /** Lloyd's k-means over this (vec_id, embedding) frame: per-cluster
      * counts + inertia; everything keyed aggregations, vectors never
      * pair with vectors.
      */
    def kmeans(k: Int = 4, iters: Int = 2): DataFrame =
      operators.KMeans.kmeansOf(df, k, iters)

    /** Johnson-Lindenstrauss random projection to `dOut` dims (fixed
      * md5-parity sign matrix, one fused codegen'd loop; pure map-side).
      * Expects (vec_id, embedding).
      */
    def randomProject(dOut: Int = 16): DataFrame =
      operators.Quantization.randomProjectionOf(df, dOut)

    /** Exact cosine top-k against a broadcast probe vector column. */
    def cosineTopK(probe: DataFrame, embCol: String, idCol: String,
        k: Int): DataFrame = {
      functions.VectorFunctions.register(df.sparkSession)
      df.crossJoin(broadcast(probe.select(col(embCol).as("__probe"))))
        .select(col(idCol),
          functions.VectorFunctions.cosineSim(col(embCol), col("__probe"))
            .as("score"))
        .orderBy(col("score").desc, col(idCol).asc)
        .limit(k)
    }
  }

  implicit class GraftJoinOps(private val df: DataFrame) {

    /** As-of join: latest `right` row at or before each left timestamp. */
    def asOf(right: DataFrame, key: String, ts: String,
        payload: Seq[String], tiebreak: String): DataFrame =
      operators.AsOfJoin.asOfJoin(df, right, key, ts, payload, tiebreak)

    /** Salted inner join for pathological single-key skew. */
    def saltedJoin(small: DataFrame, key: String, salt: Int): DataFrame =
      operators.SkewJoin.saltedInnerJoin(df, small, key, salt)

    /** Banded range join: rows of this frame whose `vCol` falls in
      * `right`'s [loCol, hiCol] intervals — equi-join on the value
      * bucket, never a nested loop. Pick `band` ≥ typical interval width.
      */
    def rangeJoin(right: DataFrame, vCol: String, loCol: String,
        hiCol: String, band: Long): DataFrame =
      operators.RangeJoin.banded(df, vCol, right, loCol, hiCol, band)
  }

  implicit class GraftTimeSeriesOps(private val df: DataFrame) {

    /** Hourly gap-fill + last-observation-carried-forward; expects
      * (user_id, ts, event_id, value) columns.
      */
    def gapFillHourly(): DataFrame =
      operators.TimeSeries.gapFillHourlyOf(df)

    /** Hourly gap-fill with LINEAR interpolation between the neighboring
      * observations; expects (user_id, ts, event_id, value) columns.
      */
    def interpolateHourly(): DataFrame =
      operators.TimeSeries.interpolateHourlyOf(df)

    /** Greedy contiguous pattern matches (MATCH_RECOGNIZE-class: steps
      * over event_type with optional OneOrMore greed, SKIP PAST LAST
      * ROW, completion window); expects (user_id, ts, event_id,
      * event_type) columns. Pattern symbols must be pairwise distinct
      * and the last step One — see [[operators.Cep]].
      */
    def cepMatch(pattern: Seq[operators.Cep.Step], windowUs: Long,
        after: operators.Cep.AfterMatch = operators.Cep.SkipPastLast)
        : DataFrame =
      operators.Cep.cepMatchOf(df, pattern, windowUs, after).toDF()

    /** Per-match per-step MEASURES (COUNT/SUM of cents value/FIRST/
      * LAST event id) — [[operators.Cep.cepMeasuresOf]]; expects the
      * cepMatch columns plus `value`.
      */
    def cepMeasures(pattern: Seq[operators.Cep.Step], windowUs: Long,
        after: operators.Cep.AfterMatch = operators.Cep.SkipPastLast)
        : DataFrame =
      operators.Cep.cepMeasuresOf(df, pattern, windowUs, after).toDF()

    /** Relaxed-contiguity pattern matches (Flink CEP `followedBy`:
      * rows between steps are skipped; One steps only) — see
      * [[operators.Cep.cepFollowedByOf]].
      */
    def cepFollowedBy(pattern: Seq[operators.Cep.Step], windowUs: Long,
        after: operators.Cep.AfterMatch = operators.Cep.SkipPastLast)
        : DataFrame =
      operators.Cep.cepFollowedByOf(df, pattern, windowUs, after).toDF()
  }

  implicit class GraftEntityOps(private val df: DataFrame) {

    /** Matched record pairs (i, j, lev, gap) via banded blocking +
      * in-block levenshtein; expects (rec_id, name, nat, seg, bal).
      */
    def matchPairs(): DataFrame = operators.EntityResolution.matchedPairs(df)

    /** Resolved entities: transitive match clusters + lowest-id
      * survivorship; expects (rec_id, name, nat, seg, bal).
      */
    def resolveEntities(): DataFrame = operators.EntityResolution.resolveOf(df)
  }

  implicit class GraftLayoutOps(private val df: DataFrame) {

    /** Equi-depth range-partition report for `valueCol` into `k` shards:
      * per-shard count + [lo, hi], proving balance and disjointness.
      */
    def rangePartitionStats(valueCol: String, k: Int): DataFrame =
      operators.Layout.rangePartitionStats(df, valueCol, k)

    /** Cluster for writing: range-partition + locally sort by the Morton
      * interleave of two quantized dimensions (min/max pruning in BOTH).
      */
    def zorderClustered(xCol: String, yCol: String, partitions: Int): DataFrame =
      operators.Layout.zorderCluster(df, xCol, yCol, partitions)
  }
}
