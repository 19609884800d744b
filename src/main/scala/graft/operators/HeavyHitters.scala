package graft.operators

import graft.Tables.t
import graft.functions.FreqFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact heavy hitters without shuffling the key universe — the
  * two-phase sketch-then-recount pattern (the scalable form of
  * `GROUP BY key HAVING count(*) >= ceil(n*f)`).
  *
  * Phase 1 scans the facts once through the Misra-Gries aggregate
  * ([[graft.functions.MisraGries]]): map-side partials keep O(k)
  * counters, the shuffle carries one bounded buffer per partition, and
  * with k+1 > 1/f the resulting <= k candidates are a GUARANTEED
  * superset of every item with frequency >= ceil(n*f). Phase 2
  * broadcast-joins the candidate list back onto the facts and recounts
  * exactly — partial aggregation means that shuffle carries at most
  * k rows per partition too. Neither phase's shuffle volume depends on
  * the key cardinality, only on k; the plain one-pass GROUP BY shuffles
  * every distinct key (at 100 TB, almost all of them hopeless tails).
  *
  * Both phases live in ONE declarative plan (the 1-row sketch result is
  * exploded and joined, not collected), so the whole thing is a single
  * action with no driver round-trip. Output is exact and deterministic
  * regardless of how partitioning varies the sketch's internal contents.
  */
object HeavyHitters {

  /** Items (and exact counts) covering >= frac of `fact` rows. `k` must
    * satisfy k+1 > 1/frac for the superset guarantee.
    */
  def heavyHitters(fact: DataFrame, item: org.apache.spark.sql.Column,
      frac: Double, k: Int): DataFrame = {
    require(k + 1 > 1.0 / frac,
      s"k=$k too small for frac=$frac: need k+1 > ${1.0 / frac}")
    FreqFunctions.register(fact.sparkSession)
    val f = fact.select(item.cast("long").as("item"))
    val cands = f
      .agg(FreqFunctions.mgFreqCandidates(col("item"), k).as("cands"),
        count(lit(1)).as("n"))
      .select(explode(col("cands.item")).as("item"),
        ceil(col("n") * frac).cast("long").as("thr"))
    f.join(broadcast(cands), "item")
      .groupBy(col("item"), col("thr"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= col("thr"))
      .select(col("item"), col("cnt"))
      .orderBy(col("cnt").desc, col("item"))
  }

  /** Gate query: heavy hitters at 1% over a transparently skew-projected
    * lineitem key (the synthetic testdata is near-uniform, so the query
    * collapses partkeys with residue 0-2 mod 10 onto 3 hot keys — ~10%
    * of rows each — leaving ~1400 cold keys at sf0.01). k=128 satisfies
    * the k+1 > 1/f bound with f=0.01 while staying far below the key
    * cardinality, so the sketch genuinely compresses.
    */
  def freqHeavyHitters(s: SparkSession, dir: String): DataFrame =
    heavyHitters(t(s, dir, "lineitem"),
      when(col("l_partkey") % 10 < 3, col("l_partkey") % 10)
        .otherwise(col("l_partkey")),
      frac = 0.01, k = 128)

  /** Per-GROUP exact heavy hitters — the same two-phase sketch-then-
    * recount, one sketch per group: phase 1 is a grouped aggregation
    * whose partial buffers hold O(k) counters per (group, partition)
    * (the undercount bound n_g/(k+1) applies within each group
    * independently — merges never cross groups), so the shuffle carries
    * groups × bounded buffers, never the per-group key universes. Phase
    * 2 recounts the ≤ groups·k candidates exactly. The candidate table
    * here is broadcast (groups·k is parameter-sized for any dashboard-
    * shaped group column); with millions of groups swap the broadcast
    * for a (grp, item)-keyed shuffle join — same plan shape otherwise.
    */
  def heavyHittersByGroup(fact: DataFrame, grp: org.apache.spark.sql.Column,
      item: org.apache.spark.sql.Column, frac: Double, k: Int): DataFrame = {
    require(k + 1 > 1.0 / frac,
      s"k=$k too small for frac=$frac: need k+1 > ${1.0 / frac}")
    FreqFunctions.register(fact.sparkSession)
    val f = fact.select(grp.as("grp"), item.cast("long").as("item"))
    val cands = f.groupBy(col("grp"))
      .agg(FreqFunctions.mgFreqCandidates(col("item"), k).as("cands"),
        count(lit(1)).as("n"))
      .select(col("grp"), explode(col("cands.item")).as("item"),
        ceil(col("n") * frac).cast("long").as("thr"))
    f.join(broadcast(cands), Seq("grp", "item"))
      .groupBy(col("grp"), col("item"), col("thr"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= col("thr"))
      .select(col("grp"), col("item"), col("cnt"))
      .orderBy(col("grp"), col("cnt").desc, col("item"))
  }

  /** Gate query: per-event-type heavy hitters at 5% over the skew-
    * projected user key (residues 0-2 mod 10 collapse onto 3 hot users
    * at ~10% of each type's rows; the ~147 cold users sit well under
    * threshold). k=32 satisfies k+1 > 1/0.05 while staying far below
    * the 150-user cardinality.
    */
  def freqHeavyHittersGrouped(s: SparkSession, dir: String): DataFrame =
    heavyHittersByGroup(t(s, dir, "events"), col("event_type"),
      when(col("user_id") % 10 < 3, col("user_id") % 10)
        .otherwise(col("user_id")),
      frac = 0.05, k = 32)
}
