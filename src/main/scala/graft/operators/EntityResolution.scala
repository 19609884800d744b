package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage): find records that describe the
  * same real-world entity despite typos and attribute drift, cluster
  * them transitively, and elect a canonical survivor per cluster — the
  * classic blocking → pairwise-scoring → transitive-closure →
  * survivorship pipeline (Fellegi-Sunter framing; the data-cleaning
  * sibling of the near-dup dedup family in [[Dedup]]).
  *
  * Scale shape, in the order the hazards appear:
  *   - **Blocking, not all-pairs.** Candidate generation is an equi-join
  *     on (nation, segment, balance-band): records can only pair inside
  *     a block, so pair volume is Σ block² over bands, never corpus².
  *     The balance band uses the canonical banded-range-join trick (see
  *     [[RangeJoin]] / ts_overlap): band width 2× the match tolerance,
  *     each left record probes its own and the next band, and a
  *     same-band pair is admitted only in (lo,hi) id order — every
  *     candidate pair is generated EXACTLY once, no distinct pass over
  *     pairs.
  *   - **Expensive comparator only on candidates.** `levenshtein` runs
  *     inside the join's post-condition projection, i.e. once per
  *     candidate, never per cross pair. (With TPC-H-shaped names a
  *     length/prefix pre-filter would cut further; at 18-char names the
  *     comparator is already cheap next to the shuffle.)
  *   - **Transitive closure** reuses [[Dedup.clustersOfPairs]] — min-
  *     label propagation with pointer jumping, everything key-
  *     partitioned, O(log diameter) rounds.
  *   - **Survivorship is one keyed aggregation**: `min_by` elects the
  *     lowest-id (original) record, min/max give the cluster's balance
  *     envelope — all order-independent aggregates, no window.
  *
  * The registry under test is synthesized deterministically from
  * `customer` (originals + typo'd variants for custkey ≡ 0 mod 5 and a
  * second variant mod 10), so the DuckDB oracle can rebuild the exact
  * same dirty data and replay the match definitionally (full in-block
  * join, no banding) — blocking completeness is therefore part of what
  * the gate proves: a candidate the bands missed would show up as a
  * missing oracle row.
  *
  * Reference scope: the reference engine has no entity-resolution
  * operator; this extends the dedup family to keyed-record linkage the
  * same way emb_semdedup extends it to embeddings.
  */
object EntityResolution {

  /** Match tolerance on account balance (absolute). */
  private val BalTol = 0.10
  /** Blocking band width — 2× tolerance so |Δbal| ≤ BalTol always lands
    * in the same or adjacent band (float-slop safe).
    */
  private val BandW = 0.20
  /** Max edit distance between names of matching records. */
  private val MaxLev = 2

  /** Deterministic dirty registry: every customer as an "original"
    * record (rec_id = 10·custkey), plus a deletion-typo variant for
    * custkey ≡ 0 (mod 5) (rec_id +1, one digit dropped, balance drifted
    * ±0.04) and a substitution-typo variant for custkey ≡ 0 (mod 10)
    * (rec_id +2, one digit → 'x', balance drifted ±0.03). All arithmetic
    * is int-mod → double so DuckDB reproduces it bit-for-bit.
    */
  def dirtyRegistry(customer: DataFrame): DataFrame = {
    val k = col("c_custkey")
    def shape(src: DataFrame)(recId: Column, name: Column, bal: Column): DataFrame =
      src.select(recId.as("rec_id"), name.as("name"),
        col("c_nationkey").as("nat"), col("c_mktsegment").as("seg"),
        bal.as("bal"))
    // name is 'Customer#' + 9 digits (length 18); typo positions 10..17
    // stay inside the digit block
    def delAt(nm: Column, p: Column): Column =
      concat(nm.substr(lit(1), p - 1), nm.substr(p + 1, lit(32)))
    def subAt(nm: Column, p: Column): Column =
      concat(nm.substr(lit(1), p - 1), lit("x"), nm.substr(p + 1, lit(32)))
    shape(customer)(k * 10, col("c_name"), col("c_acctbal"))
      .unionAll(shape(customer.filter(k % 5 === 0))(k * 10 + 1,
        delAt(col("c_name"), lit(10) + k % 8),
        col("c_acctbal") + (k % 9 - 4).cast("double") * lit(0.01)))
      .unionAll(shape(customer.filter(k % 10 === 0))(k * 10 + 2,
        subAt(col("c_name"), lit(10) + k % 7),
        col("c_acctbal") + (k % 7 - 3).cast("double") * lit(0.01)))
  }

  /** Matched pairs (i < j) with their edit distance and balance gap.
    * Banded blocking on (nat, seg, floor(bal/BandW)); exact-once
    * candidate generation; comparator + tolerance as post-join filter.
    */
  def matchedPairs(reg: DataFrame): DataFrame = {
    val r = reg.withColumn("band", floor(col("bal") / BandW).cast("long"))
    val probe = r.select(col("rec_id"), col("name"), col("nat"), col("seg"),
      col("bal"), col("band"),
      explode(array(col("band"), col("band") + 1)).as("bk"))
    probe.as("a").join(r.as("b"),
      col("a.bk") === col("b.band") &&
        col("a.nat") === col("b.nat") && col("a.seg") === col("b.seg") &&
        // same band: admit in id order once; adjacent band: the lower-band
        // record's +1 probe is the unique generator
        ((col("a.bk") === col("a.band") && col("a.rec_id") < col("b.rec_id")) ||
          col("a.bk") =!= col("a.band")))
      .select(
        least(col("a.rec_id"), col("b.rec_id")).as("i"),
        greatest(col("a.rec_id"), col("b.rec_id")).as("j"),
        levenshtein(col("a.name"), col("b.name")).as("lev"),
        abs(col("a.bal") - col("b.bal")).as("gap"))
      .filter(col("lev") <= MaxLev && col("gap") <= BalTol)
  }

  /** er_pairs — the scored match pairs, the review surface of the
    * pipeline (what a steward would eyeball before merging).
    */
  def erPairs(s: SparkSession, dir: String): DataFrame =
    matchedPairs(dirtyRegistry(t(s, dir, "customer")))
      .select(col("i"), col("j"), col("lev").cast("long").as("lev"),
        round(col("gap"), 6).as("bal_diff"))
      .orderBy(col("i"), col("j"))

  /** er_entities — resolved entities: transitive match clusters plus
    * singletons, with the surviving (lowest-id = original) record's name
    * and the cluster's balance envelope.
    */
  def erEntities(s: SparkSession, dir: String): DataFrame =
    resolveOf(dirtyRegistry(t(s, dir, "customer")))

  /** er_incremental — incremental linkage, the production shape at
    * 100 TB: a resolved base registry is NOT re-resolved when a delta
    * batch arrives; delta records link against it. Rules, in order:
    *   1. a delta record that matches base records joins the LOWEST
    *      matched base rec_id (existing entity);
    *   2. delta records with no base match cluster among THEMSELVES
    *      (delta-delta pairs, transitive closure) — new entities keyed
    *      by their lowest member;
    *   3. one-hop semantics: a delta record d1 matching only an
    *      assigned delta d2 (never base directly) still forms a NEW
    *      entity with d2 excluded — base assignment does not propagate
    *      through delta chains (re-resolution catches those; the
    *      incremental pass must stay one keyed join deep to stay
    *      incremental).
    * Work is candidate-proportional exactly like the batch pass: one
    * banded equi-join of delta against (base ∪ delta) and one closure
    * over the (small) unmatched-delta pair graph — nothing rescans or
    * re-pairs base against base.
    *
    * Gate split: base = originals of custkey ≢ 0 (mod 4); delta = every
    * variant. Variants of mod-4 customers therefore have no base
    * original and become new entities (singletons, and 2-clusters where
    * both variants of a mod-20 customer land in the delta), while the
    * rest join their base original — all three rule paths exercised.
    */
  def erIncremental(s: SparkSession, dir: String): DataFrame = {
    val reg = dirtyRegistry(t(s, dir, "customer")).localCheckpoint(true)
    // rec_id = 10·custkey, so rec_id % 40 ≠ 0 ⇔ custkey % 4 ≠ 0
    val base = reg.filter(col("rec_id") % 10 === 0 &&
      col("rec_id") % 40 =!= 0)
    val delta = reg.filter(col("rec_id") % 10 =!= 0)
    incrementalLink(base, delta)
  }

  /** Library-facing form: link `delta` records against resolved `base`
    * (both (rec_id, name, nat, seg, bal); base rec_ids are the entity
    * keys). Returns (rec_id, assigned_rep, is_new) per delta record.
    */
  def incrementalLink(base: DataFrame, delta: DataFrame): DataFrame = {
    val pairs = matchedPairs(
      base.unionByName(delta).localCheckpoint(true)).localCheckpoint(true)
    val baseIds = base.select(col("rec_id").as("b"))
    // delta-base direct matches (either pair side may hold the base rec)
    val db = pairs.join(baseIds, col("i") === col("b"))
      .select(col("j").as("rec_id"), col("i").as("rep"))
      .unionAll(pairs.join(baseIds, col("j") === col("b"))
        .select(col("i").as("rec_id"), col("j").as("rep")))
    val assigned = db.groupBy(col("rec_id")).agg(min(col("rep")).as("rep"))
    val unmatched = delta.join(assigned, Seq("rec_id"), "left_anti")
      .select(col("rec_id"))
    // closure over pairs where BOTH ends are unmatched deltas
    val uu = pairs
      .join(unmatched.select(col("rec_id").as("i")), Seq("i"))
      .join(unmatched.select(col("rec_id").as("j")), Seq("j"))
      .select(col("i"), col("j"))
    val newLabels = Dedup.clustersOfPairs(uu)
      .select(col("doc_id").as("rec_id"), col("cluster_rep").as("rep"))
    delta.select(col("rec_id"))
      .join(assigned.withColumn("is_new", lit(0L)), Seq("rec_id"), "left")
      .join(newLabels.withColumnRenamed("rep", "nrep"), Seq("rec_id"), "left")
      .select(col("rec_id"),
        coalesce(col("rep"), col("nrep"), col("rec_id")).as("assigned_rep"),
        coalesce(col("is_new"), lit(1L)).as("is_new"))
      .orderBy(col("rec_id"))
  }

  /** Library-facing form: resolve any (rec_id, name, nat, seg, bal)
    * registry into entities (see [[erEntities]] for the output shape).
    */
  def resolveOf(registry: DataFrame): DataFrame = {
    val reg = registry.localCheckpoint(true)
    val labels = Dedup.clustersOfPairs(matchedPairs(reg).select("i", "j"))
      .select(col("doc_id").as("rec_id"), col("cluster_rep"))
    reg.join(labels, Seq("rec_id"), "left")
      .withColumn("rep", coalesce(col("cluster_rep"), col("rec_id")))
      .groupBy(col("rep"))
      .agg(min_by(col("name"), col("rec_id")).as("canonical_name"),
        count(lit(1)).as("n_recs"),
        round(min(col("bal")), 6).as("bal_min"),
        round(max(col("bal")), 6).as("bal_max"))
      .select(col("rep").as("cluster_rep"), col("canonical_name"),
        col("n_recs"), col("bal_min"), col("bal_max"))
      .orderBy(col("cluster_rep"))
  }
}
