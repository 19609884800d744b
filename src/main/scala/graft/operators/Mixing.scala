package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-composition operators: per-source caps and temperature-weighted
  * source mixing — the data-mixing stage of a training pipeline (cap a
  * crawl's dominant domains, then re-weight sources sub-linearly so big
  * sources don't drown small ones).
  *
  * Scale posture: both operators are one window (or one two-level agg) +
  * one broadcastable per-source target table. The per-key window
  * partitions on the cap key — at 100 TB that key is a domain/source with
  * high cardinality, so the window parallelizes; nothing sorts globally.
  * Ranking within a source uses `doc_id` (production: a content hash) so
  * the kept subset is deterministic, not arrival-order-dependent.
  */
object Mixing {

  /** Keep at most `cap` documents per source, lowest doc_id first — the
    * per-domain cap from crawl curation. Output one row per kept doc.
    */
  def perSourceCap(df: DataFrame, sourceCol: String, idCol: String,
      cap: Int): DataFrame = {
    val w = Window.partitionBy(col(sourceCol)).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Driver-gate query: cap documents at `cap` per source, return the
    * kept (source, doc_id, n_chars) rows.
    */
  def mixSourceCap(s: SparkSession, dir: String, cap: Int = 40): DataFrame =
    perSourceCap(t(s, dir, "documents")
        .select(col("source"), col("doc_id"), col("n_chars")),
      "source", "doc_id", cap)
      .orderBy(col("source"), col("doc_id"))

  /** Temperature mixing with INTEGER-EXACT arithmetic: per-source target
    * counts proportional to isqrt(n_s) = floor(sqrt(n_s)) — temperature
    * 0.5 re-weighting without floating-point weight normalization.
    * (`sqrt` is correctly rounded by IEEE-754, so floor(sqrt(bigint)) is
    * engine-independent; a pow(n, alpha)-based weight would differ in the
    * last ulp across libm implementations and flip floor at boundaries.)
    *
    *   target_s = totalTarget * isqrt(n_s) div sum(isqrt(n_t))
    *
    * then the target_s lowest-doc_id docs of each source are kept. The
    * per-source target table is tiny (one row per source) and broadcast;
    * the doc-side work is one window + one join.
    */
  def temperatureMix(s: SparkSession, dir: String,
      totalTarget: Int = 200): DataFrame = {
    val docs = t(s, dir, "documents").select(col("source"), col("doc_id"))
    val targets = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w", floor(sqrt(col("n_docs"))).cast("long"))
      .withColumn("target",
        expr(s"($totalTarget * w) div (sum(w) over ())"))
      .select(col("source"), col("n_docs"), col("target"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    docs.withColumn("__rn", row_number().over(w))
      .join(broadcast(targets), "source")
      .filter(col("__rn") <= col("target"))
      .select(col("source"), col("doc_id"), col("n_docs"), col("target"))
      .orderBy(col("source"), col("doc_id"))
  }

  /** Importance-weighted sampling: keep each document with probability
    * proportional to a per-row quality weight — the data-mixing stage
    * that up-samples long documents without an RNG. The coin is the
    * md5-derived uniform u = int(md5(doc_id)[0:15 hex]) / 2^60 (same
    * deterministic-hash trick as the train/val split, so the sample is
    * reproducible row-locally at any scale: no seed state, no shuffle —
    * the decision is a map-side expression). The weight here is
    * least(1, n_chars/400): division by a power of 2 and by the integer
    * constant are both exactly-rounded IEEE ops, so u < w compares
    * identically on any engine.
    */
  def importanceSample(s: SparkSession, dir: String,
      charsAtFull: Int = 400): DataFrame = {
    val u = (conv(substring(md5(col("doc_id").cast("string").cast("binary")),
      1, 15), 16, 10).cast("long").cast("double") / math.pow(2, 60))
    val w = least(lit(1.0), col("n_chars").cast("double") / charsAtFull)
    t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"), col("source"),
        w.as("__w"), u.as("__u"))
      .filter(col("__u") < col("__w"))
      .select(col("doc_id"), col("n_chars"), col("source"),
        round(col("__w"), 6).as("keep_w"))
      .orderBy(col("doc_id"))
  }

  /** mix_group_sample — EXACT-k-per-stratum deterministic sample: every
    * language keeps exactly k documents, chosen by md5-hash order (the
    * same engine-independent coin as the rate-based samplers, so the
    * subset is reproducible across runs and clusters with no RNG state).
    * Rate-based sampling (text_stratified_sample) can't promise a count;
    * this is the "give me exactly 1000 eval docs per language" form.
    *
    * Scale shape: the hash rank runs through the bounded k-heap aggregate
    * ([[graft.functions.TopKByValue]]) — map-side partials ship ≤k rows
    * per (stratum, partition) and no group is ever sorted whole, unlike
    * the row_number() window form that sorts each stratum inside one
    * task. Only 12 hex chars (48 bits) of the md5 enter the Double-typed
    * heap value so the ordering is integer-exact in IEEE-754.
    */
  def groupSample(s: SparkSession, dir: String, k: Int = 25): DataFrame = {
    graft.functions.TopKFunctions.register(s)
    val h = conv(substring(md5(col("doc_id").cast("string").cast("binary")),
      1, 12), 16, 10).cast("long").cast("double")
    t(s, dir, "documents")
      .select(col("lang"), col("doc_id"), h.as("__h"))
      .groupBy(col("lang"))
      .agg(graft.functions.TopKFunctions
        .topkByValue(col("__h"), col("doc_id"), k).as("top"))
      .select(col("lang"), explode(col("top")).as("t"))
      .select(col("lang"), col("t.id").as("doc_id"),
        col("t.v").cast("long").as("h"))
      .orderBy(col("lang"), col("h").desc, col("doc_id"))
  }

  /** mix_pps_sample — weighted (probability-proportional-to-size)
    * SYSTEMATIC sampling: walk the cumulative weight axis and take a hit
    * at every multiple of step = totalW div m. Selection probability is
    * ∝ weight, heavy docs can be drawn multiple times (`hits` > 1 when
    * w > step), and — unlike exponential-key A-ES reservoirs — the whole
    * decision is INTEGER arithmetic on character counts, so there is no
    * libm-ulp dependence anywhere (the mix_temperature lesson).
    *
    * The cumulative sum is the ts_concurrency distributed prefix-sum
    * (fixed doc-id shards → per-shard cumsum → P-row offset broadcast):
    * no global-window single task, which is what a naive
    * `SUM() OVER (ORDER BY doc_id)` costs at 100 TB. The sampling anchor
    * is deterministic (offset 0) — production would draw one random
    * offset per run.
    */
  def ppsSample(s: SparkSession, dir: String, m: Int = 50,
      nShards: Int = 32): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("w"))
    val bounds = d.agg(min(col("doc_id")).as("d0"),
        (max(col("doc_id")) - min(col("doc_id")) + 1).as("span"),
        sum(col("w")).as("tot"))
      .localCheckpoint(true) // one row; two consumers below
    val sharded = d.crossJoin(broadcast(bounds))
      .withColumn("pid",
        expr(s"((doc_id - d0) * $nShards) div span"))
    PrefixSum.shardedCumSum(sharded, Seq.empty, "pid", "doc_id", "w")
      // floor at 1: a corpus lighter than m units would otherwise
      // divide by zero (ANSI error) — step 1 degenerates to "take all"
      .withColumn("step", greatest(expr(s"tot div $m"), lit(1L)))
      .withColumn("hits",
        expr("(cum div step) - ((cum - w) div step)"))
      .filter(col("hits") > 0)
      .select(col("doc_id"), col("w"), col("cum"), col("hits"))
      .orderBy(col("doc_id"))
  }
}
