package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe: replicate the sf0.1 tables k× (keys offset per replica
  * so cardinalities scale too) and time the heavy operators at 1× vs k×.
  * Near-linear ratios are the evidence behind PLANS.md's scale-up claims.
  *
  * Usage: runMain graft.ScaleProbe [k] [probe1,probe2,…]
  * The optional second arg restricts the run to the named probes (the
  * 32×-tier re-checks don't need the whole book); replica tables are
  * materialized lazily so a filtered run only builds what it times.
  */
object ScaleProbe {
  def replicate(df: DataFrame, k: Int, idCols: Seq[String], n: Long): DataFrame =
    (0 until k).map { r =>
      idCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(r * n)))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 8
    val sel: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(",").toSet) else None
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // documents scaled with perturbed text (append a replica marker token
    // so replicas aren't exact dups of each other but keep shingle mass)
    val docs1 = Tables.t(spark, dir, "documents")
    lazy val docsK = (0 until k).map { r =>
      docs1.withColumn("doc_id", col("doc_id") + lit(r * 10000L))
        .withColumn("text", concat(col("text"), lit(s" replica marker r$r")))
    }.reduce(_ unionByName _).localCheckpoint(true)
    lazy val docs1c = docs1.localCheckpoint(true)

    lazy val li1 = Tables.t(spark, dir, "lineitem").localCheckpoint(true)
    lazy val liK = replicate(Tables.t(spark, dir, "lineitem"), k,
      Seq("l_orderkey"), 10000000L).localCheckpoint(true)
    lazy val o1 = Tables.t(spark, dir, "orders").localCheckpoint(true)
    lazy val oK = replicate(Tables.t(spark, dir, "orders"), k,
      Seq("o_orderkey", "o_custkey"), 10000000L).localCheckpoint(true)
    lazy val c1 = Tables.t(spark, dir, "customer").localCheckpoint(true)
    lazy val cK = replicate(Tables.t(spark, dir, "customer"), k,
      Seq("c_custkey"), 10000000L).localCheckpoint(true)

    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    lazy val e1 = Tables.t(spark, dir, "events")
      .filter(col("user_id") % 10000000L < 200).localCheckpoint(true)
    lazy val eK = replicate(Tables.t(spark, dir, "events"), k,
      Seq("event_id", "user_id"), 10000000L)
      .filter(col("user_id") % 10000000L < 200).localCheckpoint(true)
    lazy val pt = Tables.t(spark, dir, "part").filter(col("p_size") <= 10)
      .select(col("p_partkey"),
        (col("p_size") - 2).cast(DoubleType).as("lo"),
        (col("p_size") + 2).cast(DoubleType).as("hi"))
      .localCheckpoint(true)

    def agg(df: DataFrame) = df.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast(DecimalType(12, 2))).cast(DoubleType))
    def join(o: DataFrame, c: DataFrame) =
      o.join(c, o("o_custkey") === c("c_custkey")).select(col("o_orderkey"), col("c_name"))
    def dedup(docs: DataFrame) = operators.Dedup.minhashLshPairs(docs, 0.7)
    // histogram-compressed banded range join: cost tracks the value
    // domain, not fact rows — ratio should stay near 1 at any k
    def rangeJoin(li: DataFrame) = operators.RangeJoin.banded(
        li.groupBy(col("l_quantity")).agg(count(lit(1)).as("n")),
        "l_quantity", pt, "lo", "hi", 5L)
      .groupBy(col("p_partkey")).agg(sum(col("n")).as("n_li"))
    def gapfill(e: DataFrame) = operators.TimeSeries.gapFillHourlyOf(e)
    // sketch-pruned exact percentile: few-key worst case — the old
    // sort-rank form would bottleneck on 3 single-task sorts here
    def pctl(li: DataFrame) = operators.Percentiles.grouped(
      li, "l_returnflag", "l_extendedprice", Seq(0.5, 0.9))

    // temperature mix: one per-source window + broadcast target table —
    // work is linear in docs, parallelism bounded by source cardinality
    // (97 sources > 32 cores here; at 100 TB the cap key is a domain)
    def mix(docs: DataFrame) = {
      val d = docs.select(col("source"), col("doc_id"))
      val targets = d.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("w", floor(sqrt(col("n_docs"))).cast("long"))
        .withColumn("target", expr("(200 * w) div (sum(w) over ())"))
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))
      d.withColumn("__rn", row_number().over(win))
        .join(broadcast(targets), "source")
        .filter(col("__rn") <= col("target"))
    }

    // top-3 per priority: the window form sorts each of the 5 groups in
    // one task each (k-invariant single-reducer sorts); the heap
    // aggregate stays partial-agg-bound — measure both
    graft.functions.TopKFunctions.register(spark)
    def topkWin(o: DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
    }
    def topkAgg(o: DataFrame) = o.groupBy(col("o_orderpriority"))
      .agg(graft.functions.TopKFunctions
        .topkByValue(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
    // skyline: local sweeps are shuffle-free; only candidates move
    def sky(li: DataFrame) = operators.Skyline.skyline2D(
      li.select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice")),
      "l_quantity", "l_extendedprice")

    // Spearman: 3 fixed groups with k× rows — the histogram-prefix-sum
    // rank path must NOT degrade to per-group sorts as groups grow
    def spear(li: DataFrame) = queries.Relational.spearmanOf(
      li.select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice")))

    // edit-distance dedup: replicas padded to length gaps > maxDist so
    // the length-band blocking keeps replicas apart (linear candidates);
    // same-length replicas would BE near-dups (quadratic by construction)
    lazy val docsLevK = (0 until k).map { r =>
      docs1.withColumn("doc_id", col("doc_id") + lit(r * 10000L))
        .withColumn("text", concat(col("text"), lit("x" * (6 * r))))
    }.reduce(_ unionByName _).localCheckpoint(true)
    def lev(docs: DataFrame) = operators.Dedup.editDistancePairs(docs, 4)

    // interval overlap: 2-minute activity spans banded at 4 minutes
    def overlap(e: DataFrame) = {
      val iv = e.select(col("user_id"), unix_micros(col("ts")).as("s"))
        .withColumn("t", col("s") + 120000000L)
      val a = iv.filter(col("user_id") % 2 === 0)
        .select(col("user_id").as("ua"), col("s").as("a_s"), col("t").as("a_e"))
      val b = iv.filter(col("user_id") % 2 =!= 0)
        .select(col("user_id").as("ub"), col("s").as("b_s"), col("t").as("b_e"))
      operators.RangeJoin.overlapBanded(a, "a_s", "a_e", b, "b_s", "b_e",
        240000000L)
    }

    // triangles: disjoint replica graphs (both keys offset) — expect
    // near-linear; the orientation bound keeps wedge volume O(m^1.5)
    lazy val liG1 = Tables.t(spark, dir, "lineitem")
      .filter(col("l_partkey") % 4 === 0)
      .select(col("l_orderkey"), col("l_partkey")).localCheckpoint(true)
    lazy val liGK = replicate(Tables.t(spark, dir, "lineitem")
        .filter(col("l_partkey") % 4 === 0)
        .select(col("l_orderkey"), col("l_partkey")), k,
      Seq("l_orderkey", "l_partkey"), 10000000L).localCheckpoint(true)
    def tri(items: DataFrame) =
      operators.Graph.triangleStats(operators.Graph.basketEdges(items))

    // pagerank on the same disjoint replica graphs: per-iteration work is
    // one edge join + one keyed agg — expect near-linear in edge count
    def pr(items: DataFrame) = operators.Graph
      .pageRank(operators.Graph.basketEdges(items))
      .orderBy(col("r").desc, col("n")).limit(20)

    // bfs on the disjoint replica graphs: the replica offset is ≡ 0 mod
    // 400, so seeds replicate with the graphs and every copy runs the
    // same 4-level expansion — per-level work is frontier-incident
    // edges + a visited anti join, expect near-linear in edge count
    def bfs(items: DataFrame) = {
      val edges = operators.Graph.basketEdges(items)
      val nodes = edges.select(col("u").as("n"))
        .union(edges.select(col("v").as("n"))).distinct()
      operators.Graph.bfsOf(edges, nodes.filter(col("n") % 400 === 0), 4)
    }

    // bm25: fixed query terms, so the scoring side is query-proportional
    // after the isin prune — cost is the single tokenize pass + the
    // per-doc length agg, both linear in corpus size
    def bm25(docs: DataFrame) = operators.TextAnalysis
      .bm25TopDocsOf(docs, Seq("join", "stream", "sort"), 10)

    // kmeans: vector count scales k×, parameter table (4×64 centroids)
    // fixed — per-pass cost O(n·d·k) should track n linearly
    lazy val emb1 = Tables.t(spark, dir, "embeddings").localCheckpoint(true)
    lazy val embK = replicate(Tables.t(spark, dir, "embeddings"), k,
      Seq("vec_id"), 10000000L).localCheckpoint(true)
    def km(e: DataFrame) = operators.KMeans.kmeansOf(e, 4, 2)

    // as-of head-to-head: the custom exec (2 exchanges + merge) vs the
    // union-carry-forward composition (union + window + filter)
    lazy val eA1 = Tables.t(spark, dir, "events").localCheckpoint(true)
    lazy val eAK = replicate(Tables.t(spark, dir, "events"), k,
      Seq("event_id", "user_id"), 10000000L).localCheckpoint(true)
    def asofParts(e: DataFrame) = {
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("event_id").as("sid"),
          unix_micros(col("ts")).as("sts"))
      (clicks, signups)
    }
    def asofNative(e: DataFrame) = {
      val (clicks, signups) = asofParts(e)
      plans.NativeAsOfJoin.asOf(clicks, signups, "user_id", "ts", "sid",
        Seq("sid" -> "signup_event_id", "sts" -> "signup_ts_us"))
    }
    def asofComposed(e: DataFrame) = {
      val (clicks, signups) = asofParts(e)
      operators.AsOfJoin.asOfJoin(clicks, signups, "user_id", "ts",
        Seq("sid", "sts"), "sid")
    }

    // media/audio: pure map-side codec work (encode+decode per doc) —
    // expect near-linear; aHash near-dup pairs over DISTINCT classes,
    // so its join cost tracks class count, not corpus size
    def audioW(docs: DataFrame) =
      operators.Multimodal.audioWindowsOf(docs.select(col("doc_id")), 16)
    def ahashNd(docs: DataFrame) =
      operators.Multimodal.ahashNearDupOf(docs.select(col("doc_id")), 2)

    // capstone: minhash clusters + canonical + split + sharded prefix
    // sum — the full composition; clustering dominates
    def shards(docs: DataFrame) =
      operators.TextAnalysis.trainShardsOf(docs, 0.7, 2048, 32)

    // sketch cube: shuffled bytes are fixed-size sketch buffers per
    // (day, type) cell — cell count is k-invariant here, so the agg
    // input scales k× but the exchanges stay constant-width
    def qcube(e: DataFrame) = operators.SketchRollup.quantileRollupOf(e)
    def theta(e: DataFrame) = operators.SketchRollup.thetaAudienceOf(e)
    def omatrix(e: DataFrame) = operators.SketchRollup.overlapMatrixOf(e)

    // bloom decontam: 1 MiB sketch regardless of k; probe is map-side, so
    // cost is one pass over the train grams — expect near-linear
    def decb(docs: DataFrame) = operators.TextAnalysis.decontamBloomOf(
      docs.filter(col("doc_id") % 50 =!= 0), docs.filter(col("doc_id") % 50 === 0))
    // snapshot novelty: map-side probe + candidate-only confirm —
    // near-linear (replica texts are distinct, so candidates stay sparse)
    def snap(docs: DataFrame) = operators.Dedup.bloomSnapshotDedupOf(
      docs.filter(col("doc_id") % 3 === 0), docs.filter(col("doc_id") % 3 =!= 0))
    // cdc chunking: map-side boundary scan + digest-keyed frequency join
    // — expect near-linear (replica texts are distinct, sharing sparse)
    def cdc(docs: DataFrame) = {
      import org.apache.spark.sql.GraftSqlShim
      val d = docs.select(col("doc_id"),
        regexp_replace(trim(lower(col("text"))), "[^a-z0-9]+", " ").as("norm"))
      val ch = d.select(col("doc_id"),
        explode(GraftSqlShim.column(graft.functions.CdcChunks(
          GraftSqlShim.expression(col("norm"))))).as("chunk"))
        .select(col("doc_id"), xxhash64(col("chunk")).as("h"))
      val g = ch.groupBy(col("h")).agg(count_distinct(col("doc_id")).as("nd"))
      ch.join(g, "h").groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared"))
    }
    // semdedup under the SemDeDup scaling recipe: cluster count grows
    // with the corpus (4 → 4k), holding cell cardinality fixed so the
    // within-cell quadratic kernel stays constant-sized per cell —
    // expect near-linear. (Fixed k would grow cells k× and the kernel
    // k²×; that is the documented anti-pattern, not a bug.)
    graft.functions.VectorFunctions.register(spark)
    def sem(e: DataFrame, clusters: Int) =
      operators.Similarity.semDedupOf(e, clusters, 2, 0.4)
    // the guardrail under the ANTI-pattern (fixed k, growing corpus):
    // cells grow k× and the uncapped kernel k²× — with the occupancy cap
    // the per-cell pair work is constant by construction, so the probe
    // must come back ≤ linear (the assignment pass is the linear part)
    def semCap(e: DataFrame, clusters: Int, cap: Int) =
      operators.Similarity.semDedupOf(e, clusters, 2, 0.4, Some(cap))
    // hierarchical: coarse k FIXED, per-cell sub-clustering refines —
    // moves the superlinear stage from the pair join (occ²) to the
    // grouped sub-assignment (occ·s = occ²/target), a factor-target
    // reduction, recursively composable at real scale
    def semHier(e: DataFrame, clusters: Int, target: Int) =
      operators.Similarity.semDedupHierOf(e, clusters, 2, 0.4, target)
    // bounded-fanout recursion: each level ≤ n·fanout·d vs the one-shot
    // hierarchy's n·s — the multi-level k-means tree
    def semRec(e: DataFrame, clusters: Int, target: Int) =
      operators.Similarity.semDedupRecursiveOf(e, clusters, 2, 0.4, target)

    // entity resolution: replicas get disjoint balance ranges (offset
    // far beyond the acctbal domain), modeling MORE entities at the same
    // per-block density — block occupancy is k-invariant, so the banded
    // candidate volume (Σ block²) grows linearly. Replicating into the
    // SAME bands would grow it k²× — that is the pathological
    // self-similar-registry case, mitigated by finer blocking keys, not
    // a plan property.
    lazy val cEr1 = c1
    lazy val cErK = (0 until k).map { r =>
      Tables.t(spark, dir, "customer")
        .withColumn("c_custkey", col("c_custkey") + lit(r * 10000000L))
        .withColumn("c_acctbal", col("c_acctbal") + lit(r * 1000000.0))
    }.reduce(_ unionByName _).localCheckpoint(true)
    def er(c: DataFrame) = operators.EntityResolution.matchedPairs(
      operators.EntityResolution.dirtyRegistry(c))

    // range partitioner: replicated orders repeat the same price values,
    // so the histogram/boundary path is k-invariant (distinct-value
    // sized) and only the map-side assignment scales — expect ≤ linear
    def rp(o: DataFrame) =
      operators.Layout.rangePartitionStats(o, "o_totalprice", 16)

    // cusum: same segmented-scan shape as the EWMA family — one key
    // shuffle + per-partition sort + O(1)-state fold; expect near-linear
    def cusum(e: DataFrame) = operators.TimeSeries.cusumScanOf(e)
      .groupBy(col("user_id"))
      .agg(sum(when(col("alarmed"), 1L).otherwise(0L)).as("n_alarms"))
    // tfidf sim join under the FIXED absolute df cap (the occupancy
    // guardrail): per-token candidate cost ≤ cap² by construction, so
    // corpus growth pushes ubiquitous tokens OUT of the capped
    // vocabulary instead of growing any posting join quadratically
    def simPairs(docs: DataFrame) =
      operators.TextAnalysis.tfidfSimilarPairsOf(docs, 100, 0.3)
    // grouped heavy hitters: per-(group, partition) sketch buffers are
    // O(k); recount joins the bounded candidate set — expect near-linear
    def hhg(e: DataFrame) = operators.HeavyHitters.heavyHittersByGroup(
      e, col("event_type"),
      when(col("user_id") % 10 < 3, col("user_id") % 10)
        .otherwise(col("user_id")), 0.05, 32)
    // calibration: map-side binning + 10-row agg — expect near-linear
    def calib(docs: DataFrame) =
      operators.TextAnalysis.calibrationReportOf(docs)

    // vocab coverage: histogram-sized prefix sums — the vocabulary-sized
    // stage is one keyed agg; expect near-linear in token volume
    def vocab(docs: DataFrame) =
      operators.TextAnalysis.vocabCoverageOf(docs, Seq(5L, 15L, 30L), 32)
    // attribution: one user-keyed exchange + two frames; near-linear
    def attr(e: DataFrame) = queries.Analytics
      .touchAttributionOf(e, 7L * 24 * 3600 * 1000000L)
    // negative sampling: k probes per node through the shard-banded
    // ring join + candidate-proportional anti-join; near-linear with
    // shardBits stepped up alongside the node count
    def negs(items: DataFrame, bits: Int) = operators.Graph
      .negativeSampleOf(operators.Graph.basketEdges(items), 3, bits)

    // skew report / watermark report: histogram-collapsed after one
    // keyed agg — expect near-linear
    def skew(o: DataFrame) =
      operators.Quality.skewReport(o, col("o_custkey"))
    def wmark(e: DataFrame) = {
      val jitter = conv(substring(md5(col("event_id").cast("string")
        .cast("binary")), 1, 15), 16, 10).cast("long") % 120000000L
      operators.TimeSeries.watermarkReportOf(
        e.select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
          .withColumn("arrival_us", col("ts_us") + jitter), 32)
    }
    // path mining: one key exchange + leads; |types|^3-bounded count
    def paths(e: DataFrame) = queries.Analytics
      .pathTrigramsOf(e, 24L * 3600 * 1000000L, 10)

    // embargo split / quantile transform / join cardinality: histogram
    // or count-table sized after one keyed agg — expect near-linear
    def embargo(e: DataFrame) = operators.TimeSeries
      .embargoSplitOf(e, 4, 5, 86400000000L, 32)
    def jcard(o: DataFrame, li: DataFrame) = operators.Quality
      .joinCardinality(o, col("o_orderkey"), li, col("l_orderkey"))

    // ALL ROWS PER MATCH WITH UNMATCHED ROWS (r14 surface): the
    // segmented rows scan + ONE key-shuffled left join from the
    // normalized input + per-match measure windows — all keyed by
    // user_id; disjoint replica universes → expect near-linear
    def mrUnmatched(e: DataFrame) = operators.MatchRecognize
      .matchRecognizeRowsOf(e,
        operators.MatchRecognize.FunnelUnmatchedSql)
    // multi-pattern streaming CEP (r14 surface): N machines over ONE
    // shared watermark buffer — state O(buffer + N·machine); replicas
    // are disjoint keys, so drain work is per-key-linear. Replayed
    // through a MemoryStream exactly like the stream gates; the r15
    // measured channel rides spec 0.
    def cepMulti(rows: Seq[(Long, Long, Long, String, Long)]): Unit = {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      // transformWithState needs column families — RocksDB, set for
      // the probe and RESTORED after (a leaked provider would skew any
      // later streaming probe's ratio)
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val prevProv = spark.conf.getOption(provKey)
      spark.conf.set(provKey,
        "org.apache.spark.sql.execution.streaming.state" +
          ".RocksDBStateStoreProvider")
      try {
      val specs = {
        import operators.Cep.{Step, SkipToNextRow, CrossRef, PrevGt}
        Seq(
          streaming.StreamingOps.CepSpec(IndexedSeq(Step("click"),
            Step("view", plus = true), Step("purchase")), 600000000L,
            withTimeouts = true, measured = true),
          streaming.StreamingOps.CepSpec(IndexedSeq(
            Step("view", plus = true), Step("view")), 180000000L),
          streaming.StreamingOps.CepSpec(IndexedSeq(Step("view"),
            Step("click"), Step("view")), 600000000L,
            after = SkipToNextRow),
          // r16: the RELAXED CROSS machine class (generalized
          // subsequence walk + path-tracked navigation) — the most
          // expensive walk on the shared replay, probed at scale
          streaming.StreamingOps.CepSpec(IndexedSeq(Step("click"),
            Step("view", plus = true), Step("purchase",
              cross = List(CrossRef(1, first = true, PrevGt)))),
            600000000L, contiguous = false))
      }
      val src = MemoryStream[(Long, Long, Long, String, Long)]
      // q.stop() lives in the finally: if processAllAvailable throws,
      // a still-running query would skew every later probe even with
      // the provider conf restored
      var q: org.apache.spark.sql.streaming.StreamingQuery = null
      try {
        q = streaming.StreamingOps
          .cepStreamMultiMeasured(src.toDS(), specs).toDF()
          .writeStream.format("noop").outputMode("append").start()
        val flushTs = rows.iterator.map(_._2).max + 1200000000L
        src.addData(rows)
        q.processAllAvailable()
        src.addData((-1L, flushTs, -1L, "flush", 0L))
        q.processAllAvailable()
      } finally if (q != null) q.stop()
      } finally prevProv match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }
    import spark.implicits._
    lazy val cepRows1: Seq[(Long, Long, Long, String, Long)] = {
      e1.select(col("user_id"), unix_micros(col("ts")),
        col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long"))
        .as[(Long, Long, Long, String, Long)].collect().sortBy(_._2).toSeq
    }
    lazy val cepRowsK: Seq[(Long, Long, Long, String, Long)] = {
      eK.select(col("user_id"), unix_micros(col("ts")),
        col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long"))
        .as[(Long, Long, Long, String, Long)].collect().sortBy(_._2).toSeq
    }
    // exact substring dedup (r15): shingle index + posting-capped
    // candidate join + diagonal-island windows. Replica texts get a
    // per-replica token suffix so cross-replica shingles are DISJOINT
    // (replicating identical text would plant k² near-dup pairs by
    // construction — the self-similar-corpus pathology, bounded by the
    // df cap, not a plan property); candidates then scale linearly.
    lazy val docsSubK = (0 until k).map { r =>
      val d = docs1.withColumn("doc_id", col("doc_id") + lit(r * 10000L))
      if (r == 0) d
      else d.withColumn("text",
        regexp_replace(col("text"), "([A-Za-z0-9]+)", "$1q" + r))
    }.reduce(_ unionByName _).localCheckpoint(true)
    def substr(docs: DataFrame) =
      operators.TextAnalysis.substringDedupOf(docs, 5, 15)
    // the APPLY shape (r16): detect + the exploded position-union
    // (Σ run_len rows) — the extra work over detect is
    // output-proportional, so expect the detect ratio
    def substrApply(docs: DataFrame) =
      operators.TextAnalysis.substringDedupApplyOf(docs, 5, 15)
    // the NOVELTY shape (r16): TWO indexes (corpus + incoming) joined
    // on the shingle key — both sides scale with the replica count,
    // candidates stay disjoint across replicas → expect linear
    def substrNov(docs: DataFrame) =
      operators.TextAnalysis.substringNoveltyOf(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0), 5, 15)
    // the REWRITE shape (r17): detect + the position-union explode +
    // the map-side indexed-lambda re-materialization (ordered token
    // filter + concat_ws per doc — corpus-linear map work on top of
    // apply's accounting; the clean strings never shuffle) → expect
    // ~the apply ratio
    def substrRewrite(docs: DataFrame) =
      operators.TextAnalysis.substringDedupRewriteOf(docs, 5, 15)

    // warm forces the lazy replica tables' localCheckpoint OUTSIDE the
    // timers — otherwise the first probe touching a table absorbs its
    // build cost and reports a polluted ratio
    def probe(name: String, warm: => Unit)(
        f: => (Double, Double)): Option[(String, Double, Double)] =
      if (sel.forall(_.contains(name))) { warm; val (a, b) = f; Some((name, a, b)) }
      else None
    val results = Seq(
      probe("embargo_split", { eA1; eAK; () })((
        time(noop(embargo(eA1))), time(noop(embargo(eAK))))),
      probe("join_card", { o1; li1; oK; liK; () })((
        time(noop(jcard(o1, li1))), time(noop(jcard(oK, liK))))),
      probe("skew_report", { o1; oK; () })((
        time(noop(skew(o1))), time(noop(skew(oK))))),
      probe("watermark_rep", { eA1; eAK; () })((
        time(noop(wmark(eA1))), time(noop(wmark(eAK))))),
      probe("path_trigrams", { eA1; eAK; () })((
        time(noop(paths(eA1))), time(noop(paths(eAK))))),
      probe("vocab_coverage", { docs1c; docsK; () })((
        time(noop(vocab(docs1c))), time(noop(vocab(docsK))))),
      probe("attribution", { eA1; eAK; () })((
        time(noop(attr(eA1))), time(noop(attr(eAK))))),
      probe("neg_sampling", { liG1; liGK; () })((
        time(noop(negs(liG1, 4))), time(noop(negs(liGK, 4 + (31 - Integer.numberOfLeadingZeros(k))))))),
      probe("cusum_scan", { eA1; eAK; () })((
        time(noop(cusum(eA1))), time(noop(cusum(eAK))))),
      probe("tfidf_simpairs", { docs1c; docsK; () })((
        time(noop(simPairs(docs1c))), time(noop(simPairs(docsK))))),
      probe("hh_grouped", { eA1; eAK; () })((
        time(noop(hhg(eA1))), time(noop(hhg(eAK))))),
      probe("calibration", { docs1c; docsK; () })((
        time(noop(calib(docs1c))), time(noop(calib(docsK))))),
      probe("agg_q10", { li1; liK; () })((
        time(noop(agg(li1))), time(noop(agg(liK))))),
      probe("er_pairs", { cEr1; cErK; () })((
        time(noop(er(cEr1))), time(noop(er(cErK))))),
      probe("range_partition", { o1; oK; () })((
        time(noop(rp(o1))), time(noop(rp(oK))))),
      probe("kll_cube", { eA1; eAK; () })((
        time(noop(qcube(eA1))), time(noop(qcube(eAK))))),
      probe("theta_sets", { eA1; eAK; () })((
        time(noop(theta(eA1))), time(noop(theta(eAK))))),
      probe("overlap_matrix", { eA1; eAK; () })((
        time(noop(omatrix(eA1))), time(noop(omatrix(eAK))))),
      probe("topk_window", { o1; oK; () })((
        time(noop(topkWin(o1))), time(noop(topkWin(oK))))),
      probe("topk_heapagg", { o1; oK; () })((
        time(noop(topkAgg(o1))), time(noop(topkAgg(oK))))),
      probe("skyline", { li1; liK; () })((
        time(noop(sky(li1))), time(noop(sky(liK))))),
      probe("join_q04", { o1; c1; oK; cK; () })((
        time(noop(join(o1, c1))), time(noop(join(oK, cK))))),
      probe("range_join", { li1; liK; pt; () })((
        time(noop(rangeJoin(li1))), time(noop(rangeJoin(liK))))),
      probe("ts_gapfill", { e1; eK; () })((
        time(noop(gapfill(e1))), time(noop(gapfill(eK))))),
      probe("percentile", { li1; liK; () })((
        time(noop(pctl(li1))), time(noop(pctl(liK))))),
      probe("temp_mix", { docs1c; docsK; () })((
        time(noop(mix(docs1c))), time(noop(mix(docsK))))),
      probe("spearman", { li1; liK; () })((
        time(noop(spear(li1))), time(noop(spear(liK))))),
      probe("edit_distance", { docs1c; docsLevK; () })((
        time(noop(lev(docs1c))), time(noop(lev(docsLevK))))),
      probe("interval_ovlp", { e1; eK; () })((
        time(noop(overlap(e1))), time(noop(overlap(eK))))),
      probe("triangles", { liG1; liGK; () })((
        time(noop(tri(liG1))), time(noop(tri(liGK))))),
      probe("pagerank", { liG1; liGK; () })((
        time(noop(pr(liG1))), time(noop(pr(liGK))))),
      probe("kmeans", { emb1; embK; () })((
        time(noop(km(emb1))), time(noop(km(embK))))),
      probe("asof_native", { eA1; eAK; () })((
        time(noop(asofNative(eA1))), time(noop(asofNative(eAK))))),
      probe("asof_composed", { eA1; eAK; () })((
        time(noop(asofComposed(eA1))), time(noop(asofComposed(eAK))))),
      probe("dedup_minhash", { docs1c; docsK; () })((
        time(noop(dedup(docs1c))), time(noop(dedup(docsK))))),
      probe("audio_windows", { docs1c; docsK; () })((
        time(noop(audioW(docs1c))), time(noop(audioW(docsK))))),
      probe("ahash_near_dup", { docs1c; docsK; () })((
        time(noop(ahashNd(docs1c))), time(noop(ahashNd(docsK))))),
      probe("train_shards", { docs1c; docsK; () })((
        time(noop(shards(docs1c))), time(noop(shards(docsK))))),
      probe("decontam_bloom", { docs1c; docsK; () })((
        time(noop(decb(docs1c))), time(noop(decb(docsK))))),
      probe("cdc_chunks", { docs1c; docsK; () })((
        time(noop(cdc(docs1c))), time(noop(cdc(docsK))))),
      probe("snapshot_dedup", { docs1c; docsK; () })((
        time(noop(snap(docs1c))), time(noop(snap(docsK))))),
      probe("semdedup", { emb1; embK; () })((
        time(noop(sem(emb1, 4))), time(noop(sem(embK, 4 * k))))),
      probe("semdedup_cap", { emb1; embK; () })((
        time(noop(semCap(emb1, 4, 160))), time(noop(semCap(embK, 4, 160))))),
      probe("semdedup_hier", { emb1; embK; () })((
        time(noop(semHier(emb1, 4, 160))), time(noop(semHier(embK, 4, 160))))),
      probe("semdedup_rec", { emb1; embK; () })((
        time(noop(semRec(emb1, 4, 160))), time(noop(semRec(embK, 4, 160))))),
      // the PRODUCTION RECIPE column (VERDICT r10 #6): k scales with the
      // corpus for every form, so the k× side runs 4·k coarse cells —
      // cell occupancy is held constant and refinement only tidies the
      // occupancy tail. Run these alongside the fixed-k rows in ONE
      // probe invocation so all forms share a host window.
      probe("semdedup_hier_recipe", { emb1; embK; () })((
        time(noop(semHier(emb1, 4, 160))), time(noop(semHier(embK, 4 * k, 160))))),
      probe("semdedup_rec_recipe", { emb1; embK; () })((
        time(noop(semRec(emb1, 4, 160))), time(noop(semRec(embK, 4 * k, 160))))),
      probe("graph_bfs", { liG1; liGK; () })((
        time(noop(bfs(liG1))), time(noop(bfs(liGK))))),
      probe("bm25", { docs1c; docsK; () })((
        time(noop(bm25(docs1c))), time(noop(bm25(docsK))))),
      // classifier scoring: broadcast model + one doc agg — expect linear
      probe("quality_clf", { docs1c; docsK; () })((
        time(noop(operators.TextAnalysis.scoreLinearOf(docs1c,
          operators.TextAnalysis.hashWeights(spark, 64), 64, 0.02))),
        time(noop(operators.TextAnalysis.scoreLinearOf(docsK,
          operators.TextAnalysis.hashWeights(spark, 64), 64, 0.02))))),
      // DSIR: dim-bounded model agg + broadcast scoring + top-k heap —
      // expect linear (the top-k cut is TakeOrderedAndProject)
      probe("dsir_select", { docs1c; docsK; () })((
        time(noop(operators.TextAnalysis.dsirSelectOf(docs1c,
          col("lang") === "en", 256, 100))),
        time(noop(operators.TextAnalysis.dsirSelectOf(docsK,
          col("lang") === "en", 256, 100))))),
      // BPE training: one linear corpus scan into the vocab table,
      // then VOCAB-sized merge rounds — on a replicated corpus the
      // vocab is invariant, so expect the ratio of one scan
      probe("bpe_train", { docs1c; docsK; () })((
        time(noop(operators.TextAnalysis.bpeTrainOf(docs1c, 6))),
        time(noop(operators.TextAnalysis.bpeTrainOf(docsK, 6))))),
      // CEP batch matcher (alternation funnel): segmented sequential
      // scan — one key shuffle + per-partition fold, state = current
      // partial; replicas are disjoint user universes → expect linear
      probe("cep_match", { eA1; eAK; () })((
        time(noop(operators.Cep.cepMatchOf(eA1,
          Seq(operators.Cep.Step("click", plus = false),
            operators.Cep.Step("view", plus = true, alt = Set("error")),
            operators.Cep.Step("purchase", plus = false)),
          windowUs = 24L * 3600 * 1000000).toDF())),
        time(noop(operators.Cep.cepMatchOf(eAK,
          Seq(operators.Cep.Step("click", plus = false),
            operators.Cep.Step("view", plus = true, alt = Set("error")),
            operators.Cep.Step("purchase", plus = false)),
          windowUs = 24L * 3600 * 1000000).toDF())))),
      // warm compiles the rows-scan + unmatched-join codegen on a
      // bounded slice so the 1x timer isn't charged first-touch JIT
      probe("mr_unmatched", { eA1; eAK
          noop(mrUnmatched(eA1.limit(2000))); () })((
        time(noop(mrUnmatched(eA1))), time(noop(mrUnmatched(eAK))))),
      probe("cep_multi_stream", { cepRows1; cepRowsK; () })((
        time(cepMulti(cepRows1)), time(cepMulti(cepRowsK)))),
      probe("substr_dedup", { docs1c; docsSubK; () })((
        time(noop(substr(docs1c))), time(noop(substr(docsSubK))))),
      probe("substr_apply", { docs1c; docsSubK; () })((
        time(noop(substrApply(docs1c))), time(noop(substrApply(docsSubK))))),
      probe("substr_novelty", { docs1c; docsSubK; () })((
        time(noop(substrNov(docs1c))), time(noop(substrNov(docsSubK))))),
      probe("substr_rewrite", { docs1c; docsSubK; () })((
        time(noop(substrRewrite(docs1c))),
        time(noop(substrRewrite(docsSubK)))))).flatten
    println(f"k=$k  (ideal linear ratio = $k%d)")
    results.foreach { case (name, t1, tk) =>
      println(f"$name%-14s 1x=${t1}%6.2fs  ${k}x=${tk}%6.2fs  ratio=${tk / t1}%5.2f")
    }
    spark.stop()
  }
}
