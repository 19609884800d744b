package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Distributed Lloyd's k-means as a pure relational plan — the embedding-
  * clustering stage of a training pipeline (corpus partitioning, coreset
  * selection, IVF coarse quantizers), expressed so every step is a keyed
  * aggregation Catalyst plans with map-side partials:
  *
  *   - vectors live in LONG format (vec_id, dim, x) — one explode, done
  *     once and checkpointed (every Lloyd's pass re-reads it);
  *   - the assignment pass joins vectors to the PARAMETER-sized centroid
  *     table on `dim` (k·d rows — broadcast by construction, it scales
  *     with the algorithm, not the data), accumulates per-(vec, cid)
  *     squared distances, and argmins with one more keyed agg (a
  *     min-of-struct, not a window);
  *   - the update pass is one (cid, dim)-keyed mean.
  *
  * Nothing anywhere pairs vectors with vectors; per-iteration cost is
  * O(n·d·k) spread over every partition, exactly Lloyd's. Iteration count
  * is fixed (production would run to convergence; a fixed count keeps the
  * plan static and the oracle expressible as chained CTEs).
  *
  * Cross-engine exactness (the PageRank recipe): per-dim squared
  * differences are rounded to 9 dp and summed as DECIMAL(22,12), so
  * distances — and therefore assignments, which tiebreak on cid — are
  * shuffle-order-independent and reproducible bit-for-bit against any
  * engine doing the same quantized arithmetic. Centroid means are
  * 6dp-quantized decimal sums over exact float→double casts.
  */
object KMeans {

  /** Long-format (vec_id, dim, x) view of a (vec_id, embedding) frame. */
  private def longVecs(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos").as("dim"),
        col("col").cast(DoubleType).as("x"))

  /** One assignment pass: nearest centroid per vector under the quantized
    * squared L2, ties to the lowest cid. Returns (vec_id, cid, d2).
    */
  private def assign(vecs: DataFrame, cent: DataFrame): DataFrame =
    vecs.join(broadcast(cent), "dim")
      .select(col("vec_id"), col("cid"),
        round((col("x") - col("c")) * (col("x") - col("c")), 9)
          .cast(DecimalType(22, 12)).as("t"))
      .groupBy(col("vec_id"), col("cid")).agg(sum(col("t")).as("d2"))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cid"))).as("b"))
      .select(col("vec_id"), col("b.cid").as("cid"), col("b.d2").as("d2"))

  /** emb_kmeans — k clusters, `iters` Lloyd's iterations, seeded from the
    * k lowest vec_ids (deterministic; production would k-means++ with a
    * seeded coin). Output: one row per cluster with its final membership
    * count and quantized inertia (sum of squared distances) — the
    * convergence diagnostics a pipeline actually monitors.
    */
  def kmeansClusters(s: SparkSession, dir: String, k: Int = 4,
      iters: Int = 2): DataFrame =
    // the summary aggregates off the memoized full assignment table —
    // the SAME assignmentsOf(embeddings, k, iters) run the emb_semdedup
    // family's shared fixture executes (r18; d2 rides the fixture so
    // the inertia sum is the identical decimal arithmetic)
    s.read.parquet(assignmentsPath(s, dir, k, iters))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"),
        round(sum(col("d2")).cast(DoubleType), 4).as("inertia"))
      .select(col("cid").cast("long").as("cluster"),
        col("n_members"), col("inertia"))
      .orderBy(col("cluster"))

  /** The full (vec_id, cid, d2) assignment table at (k, iters) over the
    * corpus at `dir`, memoized as a parquet PATH per process — shared
    * by the emb_kmeans gate (count + inertia summary) and the
    * emb_semdedup family's fixtures (which slice (vec_id, cid)).
    */
  private[operators] def assignmentsPath(s: SparkSession, dir: String,
      k: Int, iters: Int): String =
    graft.FixtureMemo.of("sem_asg_full", s"$dir|$k|$iters") {
      val out = graft.FixtureMemo.cleanupOnExit(java.nio.file.Files
        .createTempDirectory("graft-kmeans-asg").toString)
      assignmentsOf(t(s, dir, "embeddings"), k, iters)
        .write.mode("overwrite").parquet(out)
      out
    }

  /** Library-facing form over any (vec_id, embedding) DataFrame; seeds
    * from the k lowest vec_ids present.
    */
  def kmeansOf(emb: DataFrame, k: Int, iters: Int): DataFrame =
    assignmentsOf(emb, k, iters)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"),
        round(sum(col("d2")).cast(DoubleType), 4).as("inertia"))
      .select(col("cid").cast("long").as("cluster"),
        col("n_members"), col("inertia"))
      .orderBy(col("cluster"))

  /** Final (vec_id, cid, d2) assignment table after `iters` Lloyd's
    * iterations — the consumable form operators that PARTITION by cluster
    * (SemDeDup-style semantic dedup) build on, with the same quantized
    * arithmetic the emb_kmeans gate pins bit-exactly.
    *
    * Lineage truncation: every Lloyd's pass re-reads the long-format
    * vector table, so it must be materialized, not recomputed. With
    * `checkpointDir` unset this uses `localCheckpoint` — blocks live on
    * executors, which is the fast choice on a single JVM but means an
    * executor loss mid-iteration kills the job on a real cluster. For
    * the 100 TB run, pass a reliable (HDFS/S3) `checkpointDir` and the
    * table checkpoints through the fault-tolerant store instead — the
    * standard recompute-vs-durability trade, surfaced rather than baked
    * in. Either mode yields bit-identical assignments (the spec runs
    * both).
    */
  def assignmentsOf(emb: DataFrame, k: Int, iters: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    val vecs = checkpointDir match {
      case Some(d) =>
        // scope the context-global checkpoint dir: set, eager-write,
        // restore — an operator must not silently redirect every later
        // .checkpoint() in the session to its own path (if no dir was
        // set before, ours stays — the API has no unset)
        val sc = emb.sparkSession.sparkContext
        val prev = sc.getCheckpointDir
        sc.setCheckpointDir(d)
        try longVecs(emb).checkpoint(eager = true)
        finally prev.foreach(sc.setCheckpointDir)
      case None => longVecs(emb).localCheckpoint(true)
    }
    val seedIds = vecs.select(col("vec_id")).distinct()
      .orderBy(col("vec_id")).limit(k)
      .collect().map(_.getLong(0)).zipWithIndex.toMap
    val seedCid = seedIds.foldLeft(lit(null).cast("int")) {
      case (acc, (vid, cid)) => when(col("vec_id") === vid, cid).otherwise(acc)
    }
    var cent = vecs.withColumn("cid", seedCid).filter(col("cid").isNotNull)
      .select(col("cid"), col("dim"), col("x").as("c"))
    for (_ <- 1 to iters) {
      val a = assign(vecs, cent)
      cent = vecs.join(a.select(col("vec_id"), col("cid")), "vec_id")
        .groupBy(col("cid"), col("dim"))
        .agg(round(sum(col("x").cast(DecimalType(20, 10))).cast(DoubleType) /
          count(lit(1)), 6).as("c"))
    }
    assign(vecs, cent)
  }

  /** One GROUPED assignment pass: nearest SUB-centroid per vector within
    * its own coarse cell. The centroid join is keyed on (cid, dim) — a
    * plain equi-join, NOT a broadcast: the sub-centroid table scales
    * with Σ s(cell) (corpus/targetCell rows × d), which outgrows
    * broadcast at 100 TB but shuffles fine, and each cell's vectors
    * only ever meet their own cell's centroids.
    */
  private def subAssign(vecs: DataFrame, cent: DataFrame): DataFrame =
    vecs.join(cent, Seq("cid", "dim"))
      .select(col("vec_id"), col("cid"), col("sub"),
        round((col("x") - col("c")) * (col("x") - col("c")), 9)
          .cast(DecimalType(22, 12)).as("t"))
      .groupBy(col("vec_id"), col("cid"), col("sub"))
      .agg(sum(col("t")).as("d2"))
      .groupBy(col("vec_id"), col("cid"))
      .agg(min(struct(col("d2"), col("sub"))).as("b"))
      .select(col("vec_id"), col("cid"), col("b.sub").as("sub"))

  /** Hierarchical refinement (the SemDeDup-at-scale recipe's second
    * level): every coarse cell with occupancy above `targetCell` is
    * sub-clustered by a grouped Lloyd's with s(cell) =
    * ⌈occ/targetCell⌉ sub-centroids, ALL cells in one relational plan —
    * seeds are each cell's s lowest vec_ids (bounded-heap selection, no
    * per-cell sort), assignment is the (cid, dim)-keyed join above, the
    * update one (cid, sub, dim)-keyed mean. Returns (vec_id, cid, sub).
    *
    * What refinement can and cannot do, honestly: it splits cells that
    * are large because they span DIVERSE regions (the organic case —
    * sub-centroids spread and occupancy drops toward targetCell), but a
    * cell of near-IDENTICAL vectors cannot be split by any Lloyd's —
    * every point is equidistant to every sub-centroid, the argmin
    * tiebreak sends all of them to the lowest sub, and the refined cell
    * is exactly the coarse cell. Refinement is therefore the
    * typical-case cost reducer; the occupancy CAP
    * ([[Similarity.semDedupOf]]'s `maxCell`) remains the adversarial
    * backstop. The spec pins both behaviors.
    */
  def subAssignmentsOf(emb: DataFrame, asg: DataFrame, targetCell: Int,
      iters: Int, maxFanout: Int = Int.MaxValue): DataFrame = {
    require(targetCell > 0 && maxFanout > 1)
    val vecs = longVecs(emb)
      .join(asg.select(col("vec_id"), col("cid")), "vec_id")
      .localCheckpoint(true)
    val occ = asg.groupBy(col("cid")).agg(count(lit(1)).as("occ"))
      .withColumn("s", least(ceil(col("occ") / lit(targetCell)),
        lit(maxFanout.toLong)).cast("int"))
      .localCheckpoint(true)
    // the widest cell's sub count — one scalar (parameter-sized collect,
    // same class as the seed collect above)
    val maxS = occ.agg(max(col("s")).as("m")).head().getInt(0)
    if (maxS <= 1)
      return asg.select(col("vec_id"), col("cid"), lit(0).as("sub"))
    graft.functions.TopKFunctions.register(emb.sparkSession)
    val seeds = asg.groupBy(col("cid"))
      .agg(graft.functions.TopKFunctions.topkByValue(
        -col("vec_id").cast("double"), col("vec_id"), maxS).as("t"))
      .join(occ.select(col("cid"), col("s")), "cid")
      .select(col("cid"), col("s"), posexplode(col("t.id")))
      .filter(col("pos") < col("s"))
      .select(col("cid"), col("pos").cast("int").as("sub"),
        col("col").as("vec_id"))
    var cent = vecs.join(seeds, Seq("vec_id", "cid"))
      .select(col("cid"), col("sub"), col("dim"), col("x").as("c"))
    for (_ <- 1 to iters) {
      val a = subAssign(vecs, cent)
      cent = vecs.join(a.select(col("vec_id"), col("sub")), "vec_id")
        .groupBy(col("cid"), col("sub"), col("dim"))
        .agg(round(sum(col("x").cast(DecimalType(20, 10))).cast(DoubleType) /
          count(lit(1)), 6).as("c"))
    }
    subAssign(vecs, cent)
  }

  /** Bounded-fanout RECURSIVE refinement — the near-linear form of the
    * hierarchy: [[subAssignmentsOf]] with s = ⌈occ/target⌉ pays one
    * sub-assignment join of n·s rows (quadratic in cell occupancy at
    * fixed coarse k); capping the per-level split at `fanout` makes
    * each level cost ≤ n·fanout·d and reaches target occupancy in
    * ≈ log_fanout(occ/target) levels — total n·d·fanout·levels, the
    * multi-level k-means tree every production coarse quantizer uses.
    * Each level refines ONLY the still-oversized cells (the settled
    * majority of the corpus is untouched); composite ids pack the
    * WHOLE id space each level — hot cells as cid·fanout + sub
    * (sub ∈ [0, fanout)), cold cells as cid·fanout — so every coarse
    * cid owns the disjoint interval [cid·fanout, (cid+1)·fanout) and
    * refined ids can never collide across coarse cells (cid ≤
    * k·fanout^levels — Long-safe through every practical depth). A
    * cold cell left UNSHIFTED would alias a hot cell's sub ids (cold
    * cid 5 vs hot cid 0 sub 5), silently merging unrelated cells in
    * the refined assignment and breaking the drops ⊆ flat-drops
    * contract downstream. A cell Lloyd's cannot split (identical
    * vectors — every level sends all points to one sub) stays
    * oversized and exits with the level budget; the occupancy CAP
    * remains the hard bound for those. Returns (vec_id, cid) with the
    * refined composite cid.
    */
  def refineToTarget(emb: DataFrame, asg0: DataFrame, targetCell: Int,
      iters: Int, fanout: Int = 16, maxLevels: Int = 4): DataFrame = {
    require(fanout > 1 && maxLevels >= 1)
    var asg = asg0.select(col("vec_id"), col("cid").cast("long").as("cid"))
      .localCheckpoint(true)
    var lvl = 0
    var done = false
    while (lvl < maxLevels && !done) {
      val over = asg.groupBy(col("cid")).agg(count(lit(1)).as("occ"))
        .filter(col("occ") > targetCell).select(col("cid"))
        .localCheckpoint(true)
      // one scalar per level (level count is a parameter)
      if (over.isEmpty) done = true
      else {
        val hot = asg.join(over, "cid")
        val cold = asg.join(over, Seq("cid"), "left_anti")
        val sub = subAssignmentsOf(
          emb.join(hot.select(col("vec_id")), "vec_id"), hot,
          targetCell, iters, maxFanout = fanout)
        // BOTH branches shift into the level's id space: hot and cold
        // coarse cids are disjoint, so [cid·fanout, (cid+1)·fanout)
        // intervals are too — no hot sub id can land on a cold id
        asg = cold.select(col("vec_id"), (col("cid") * fanout).as("cid"))
          .unionByName(sub.select(col("vec_id"),
            (col("cid") * fanout + col("sub")).as("cid")))
          .localCheckpoint(true)
        lvl += 1
      }
    }
    asg
  }
}
