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
  * occupancy, never corpus², and the contract (StreamingSpec) is that the
  * union of per-batch emissions over any replay equals the batch
  * [[Dedup.minhashLshPairs]] output on the full corpus.
  *
  * Crash/replay posture: every write (pairs, bands, shingles) lands in a
  * `__batch_id=<id>` partition with dynamic-partition overwrite, so a
  * retried micro-batch REWRITES its own partitions instead of duplicating
  * them — exactly-once by idempotence, the same scheme as the foreachBatch
  * sink spec. State is written before pairs, so pairs never reference
  * fingerprints that a crash could have lost. Restart safety requires the
  * caller to pass a durable `checkpointDir` to [[stream]]; candCross also
  * guards doc_id inequality so a replayed document can never pair with
  * its own earlier fingerprints.
  */
object IncrementalDedup {

  val PairsSchema: StructType = StructType(Seq(
    StructField("i", LongType), StructField("j", LongType),
    StructField("jac", DoubleType), StructField("__batch_id", LongType)))

  private def writeIdempotent(df: DataFrame, batchId: Long, dir: String): Unit =
    df.withColumn("__batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch_id").parquet(dir)

  /** Process one batch of (doc_id, text): emit verified pairs to
    * `outDir` and fold the batch's fingerprints into `stateDir`, all
    * batch-id-partitioned for replay idempotence. Usable directly, or via
    * [[stream]] from foreachBatch.
    */
  def processBatch(batch: DataFrame, batchId: Long, stateDir: String,
      outDir: String, thr: Double = 0.7): Unit = {
    val spark = batch.sparkSession
    val bandsDir = stateDir + "/bands"
    val shsDir = stateDir + "/shingles"
    val sh = Dedup.docShinglesOf(batch).localCheckpoint(true)
    val newBands = Dedup.bandTable(sh).localCheckpoint(true)
    val newShs = Dedup.shingleArrays(sh).localCheckpoint(true)

    val haveState = new java.io.File(bandsDir).exists()
    val stBands =
      if (haveState) spark.read.parquet(bandsDir)
        // a retried batch must not see its own partial previous attempt
        .filter(col("__batch_id") =!= batchId).drop("__batch_id")
      else newBands.limit(0)
    val stShs =
      if (haveState) spark.read.parquet(shsDir)
        .filter(col("__batch_id") =!= batchId).drop("__batch_id")
      else newShs.limit(0)

    // candidates among the new docs (i < j within the batch)…
    val candNew = newBands.as("a")
      .join(newBands.as("b"),
        col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
    // …plus new docs against the accumulated corpus (either order of ids;
    // the inequality guard keeps a replayed doc from pairing with itself)
    val candCross = newBands.as("a")
      .join(stBands.as("b"),
        col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("i"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("j"))
    val cand = candNew.union(candCross).distinct()

    val pairs = Dedup.verifyJaccardArrays(cand,
      newShs.unionByName(stShs), thr).localCheckpoint(true)

    // state first, pairs last: emitted pairs never lead durable state
    writeIdempotent(newShs, batchId, shsDir)
    writeIdempotent(newBands, batchId, bandsDir)
    writeIdempotent(pairs, batchId, outDir)
  }

  /** Streaming entry: foreachBatch over a streaming (doc_id, text) frame.
    * Pass a durable `checkpointDir` for restart-safe sources; the default
    * temp dir is for deterministic single-run tests only.
    */
  def stream(docs: DataFrame, stateDir: String, outDir: String,
      thr: Double = 0.7,
      checkpointDir: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch((b: DataFrame, id: Long) =>
        processBatch(b, id, stateDir, outDir, thr))
      .option("checkpointLocation", checkpointDir.getOrElse(
        java.nio.file.Files.createTempDirectory("graft-incdedup-ck").toString))
      .start()

  /** Read the pairs emitted so far (schema-stable even before any pair). */
  def emittedPairs(spark: SparkSession, outDir: String): DataFrame =
    spark.read.schema(PairsSchema).parquet(outDir)
      .select(col("i"), col("j"), col("jac"))
}
