package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental (streaming) near-duplicate detection — the shape a
  * production ingest actually runs: each micro-batch of NEW documents is
  * checked against itself AND the accumulated corpus, emitting verified
  * near-dup pairs, then its compact fingerprints join the state.
  *
  * State per document is O(|shingles| + bands) — the raw text is never
  * retained. Candidate generation is the same LSH band equi-join as the
  * batch path (new×new self-join plus new×state join, both key-partitioned
  * on (band, bhash)); verification is the same exact-Jaccard array join.
  * Work per batch is therefore proportional to batch size × bucket
  * occupancy, never corpus², and the contract (IncrementalDedupSpec) is
  * that the union of per-batch emissions over any replay equals the batch
  * [[Dedup.minhashLshPairs]] output on the full corpus.
  *
  * Doc ids are assumed unique across the stream (re-sent ids would pair
  * with their own earlier fingerprints).
  */
object IncrementalDedup {

  val PairsSchema: StructType = StructType(Seq(
    StructField("i", LongType), StructField("j", LongType),
    StructField("jac", DoubleType)))

  /** Process one batch of (doc_id, text): emit verified pairs to
    * `outDir` (parquet, append) and fold the batch's fingerprints into
    * `stateDir`. Usable directly, or via [[stream]] from foreachBatch.
    */
  def processBatch(batch: DataFrame, stateDir: String, outDir: String,
      thr: Double = 0.7): Unit = {
    val spark = batch.sparkSession
    val bandsDir = stateDir + "/bands"
    val shsDir = stateDir + "/shingles"
    val sh = Dedup.docShinglesOf(batch).localCheckpoint(true)
    val newBands = Dedup.bandTable(sh).localCheckpoint(true)
    val newShs = Dedup.shingleArrays(sh).localCheckpoint(true)

    val haveState = new java.io.File(bandsDir).exists()
    val stBands =
      if (haveState) spark.read.parquet(bandsDir)
      else newBands.limit(0)
    val stShs =
      if (haveState) spark.read.parquet(shsDir)
      else newShs.limit(0)

    // candidates among the new docs (i < j within the batch)…
    val candNew = newBands.as("a")
      .join(newBands.as("b"),
        col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
    // …plus new docs against the accumulated corpus (either order of ids)
    val candCross = newBands.as("a")
      .join(stBands.as("b"),
        col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("i"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("j"))
    val cand = candNew.union(candCross).distinct()

    val pairs = Dedup.verifyJaccardArrays(cand,
      newShs.unionByName(stShs), thr)
    pairs.write.mode("append").parquet(outDir)

    newBands.write.mode("append").parquet(bandsDir)
    newShs.write.mode("append").parquet(shsDir)
  }

  /** Streaming entry: foreachBatch over a streaming (doc_id, text) frame. */
  def stream(docs: DataFrame, stateDir: String, outDir: String,
      thr: Double = 0.7): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch((b: DataFrame, _: Long) => processBatch(b, stateDir, outDir, thr))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-incdedup-ck").toString)
      .start()

  /** Read the pairs emitted so far (schema-stable even before any pair). */
  def emittedPairs(spark: SparkSession, outDir: String): DataFrame =
    spark.read.schema(PairsSchema).parquet(outDir)
}
