package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted in distributed batches.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake (derives "media properties" from the
  * bytes themselves); everything around it — binary schema, typed
  * Dataset encoders, mapPartitions batch shape, partition-local decode,
  * metadata join-back — is the real Spark plumbing a codec would slot
  * into. In production replace `decodeStub`'s body with the codec call;
  * signatures stay identical.
  */
object Multimodal {

  /** A media asset: id + raw payload + declared kind. */
  final case class MediaAsset(doc_id: Long, payload: Array[Byte], kind: String)

  /** Decoded metadata a real decoder would emit. */
  final case class MediaMeta(doc_id: Long, kind: String, n_bytes: Long,
      width: Long, height: Long, n_frames: Long)

  /** Documents' text re-materialized as binary payloads — the parquet
    * `binary` column shape a real multimodal table would carry.
    */
  def assets(s: SparkSession, dir: String): Dataset[MediaAsset] = {
    import s.implicits._
    t(s, dir, "documents")
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        when(col("doc_id") % 2 === 0, "image").otherwise("video").as("kind"))
      .as[MediaAsset]
  }

  /** STUB DECODER — deterministic fake standing in for an image/video
    * codec (none available in this container). Real implementation would
    * batch-decode `a.payload` here, partition-locally.
    */
  private def decodeStub(a: MediaAsset): MediaMeta = {
    val n = a.payload.length.toLong
    // first *code point* of the decoded payload (not first byte): the
    // DuckDB oracle's ascii(substring(text,1,1)) is code-point-based, so
    // byte-based width would diverge on non-ASCII leading characters
    val s = new String(a.payload, java.nio.charset.StandardCharsets.UTF_8)
    val b0 = if (s.nonEmpty) s.codePointAt(0).toLong else 0L
    MediaMeta(a.doc_id, a.kind, n,
      width = 16 + b0 % 64,
      height = 16 + n % 64,
      n_frames = if (a.kind == "video") 1 + n % 8 else 1)
  }

  /** Distributed decode: mapPartitions over the typed Dataset — one
    * decoder instance per partition (where a real codec would amortize
    * init cost), no driver involvement, output re-enters Catalyst with a
    * full schema.
    */
  def decodeMeta(s: SparkSession, dir: String): Dataset[MediaMeta] = {
    import s.implicits._
    assets(s, dir).mapPartitions(_.map(decodeStub))
  }

  /** Per-kind media stats over the decoded metadata (oracle-checked: the
    * stub is deterministic, so DuckDB reproduces it from the text bytes).
    */
  def mediaMeta(s: SparkSession, dir: String): DataFrame =
    decodeMeta(s, dir).toDF()
      .select(col("doc_id"), col("kind"), col("n_bytes"), col("width"),
        col("height"), col("n_frames"))
      .orderBy(col("doc_id"))

  /** Frame sampling plumbing: every k-th "frame" of video assets as its
    * own row — the explode shape a video pipeline uses, driven by the
    * stub's n_frames.
    */
  def frameSample(s: SparkSession, dir: String, every: Int = 2): DataFrame = {
    import s.implicits._
    decodeMeta(s, dir)
      .filter(_.kind == "video")
      .flatMap(m => (0L until m.n_frames by every.toLong)
        .map(f => (m.doc_id, f, m.width, m.height)))
      .toDF("doc_id", "frame_idx", "width", "height")
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Feature extraction over the payload: 16-bin character-distribution
    * histogram per document — a REAL feature extractor (not a stub; no
    * codec needed), the per-asset fingerprint shape an image/audio
    * featurizer would emit. Fully distributed: explode to one row per
    * character position, one keyed aggregation, fractions via the
    * carried length.
    */
  def charHistogram(s: SparkSession, dir: String, bins: Int = 16): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("text"), length(col("text")).as("n"))
      // guard empty texts (DuckDB's oracle range is empty for them, and
      // Java's split of "" yields [""])
      .filter(col("n") > 0)
      // one-pass char explode — substring(text, i, 1) per exploded row
      // would drag the whole text through every row and cost O(len²)/doc;
      // Spark's split keeps a trailing "" element (Java split limit -1),
      // dropped by the filter
      .select(col("doc_id"), col("n"),
        explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= "")
      .select(col("doc_id"), col("n"), (ascii(col("ch")) % bins).as("bin"))
      .groupBy(col("doc_id"), col("n"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("doc_id"), col("bin").cast(LongType).as("bin"),
        round(col("cnt").cast(DoubleType) / col("n"), 6).as("frac"))
      .orderBy(col("doc_id"), col("bin"))

  /** Resize plumbing over the decoded metadata: clamp both dimensions to
    * `maxDim` preserving the stub decoder's values — the metadata half of
    * a resize stage (a real codec would transform payload bytes in the
    * same mapPartitions pass that decodeMeta models).
    */
  def resizeMeta(s: SparkSession, dir: String, maxDim: Int = 32): DataFrame =
    decodeMeta(s, dir).toDF()
      .select(col("doc_id"), col("kind"), col("width"), col("height"),
        least(col("width"), lit(maxDim.toLong)).as("new_w"),
        least(col("height"), lit(maxDim.toLong)).as("new_h"))
      .orderBy(col("doc_id"))

  /** Corpus stats over mixed text/vector tables (SURVEY.md Q28): per
    * (lang, source) doc counts + exact avg char length, and the
    * embedding-dimension check join documents ⋈ embeddings.
    */
  def corpusStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("n_chars")).cast(DoubleType) / count(lit(1))).as("avg_chars"))
      .orderBy(col("lang"), col("source"))

  def dimJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").as("d")
      .join(t(s, dir, "embeddings").as("e"), col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("lang"),
        size(col("embedding")).cast(LongType).as("dim"), col("label"))
      .orderBy(col("doc_id"))

  /** pipe_media_curation — the multimodal curation chain as ONE
    * declarative plan (the mm twin of pipe_clean_corpus): decode metadata
    * (stub codec, real mapPartitions plumbing) → gate on decoded
    * properties (minimum width + byte floor) → exact content dedup
    * keeping the lowest doc_id per digest → join embeddings → per-label
    * survivor report. Every stage keeps its standalone scale shape: the
    * decode is partition-local, the gate map-side, the dedup shuffles
    * 16-byte digests, the embedding join is key-partitioned, and the
    * final report is one keyed count.
    */
  def mediaCuration(s: SparkSession, dir: String, minWidth: Long = 40,
      minBytes: Long = 120): DataFrame = {
    val meta = decodeMeta(s, dir).toDF()
      .filter(col("width") >= minWidth && col("n_bytes") >= minBytes)
    val digests = assets(s, dir).toDF()
      .select(col("doc_id"), md5(col("payload")).as("content_md5"))
    val keepers = meta.join(digests, "doc_id")
      .groupBy(col("content_md5")).agg(min(col("doc_id")).as("doc_id"))
    meta.join(keepers, "doc_id")
      .join(t(s, dir, "embeddings"), col("doc_id") === col("vec_id"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"))
      .orderBy(col("label"))
  }

  /** mm_binary_dedup — exact dedup of OPAQUE binary payloads by content
    * hash: the store-level dedup of a media lake. The payload collapses
    * to its md5 map-side, so the shuffle carries 16-byte digests — never
    * megabyte blobs (grouping by the payload itself, the text-dedup
    * shape, would ship every asset through the exchange). Keeper = lowest
    * doc_id; only duplicated digests are reported.
    */
  def binaryDedup(s: SparkSession, dir: String): DataFrame =
    assets(s, dir).toDF()
      .select(col("doc_id"), md5(col("payload")).as("content_md5"))
      .groupBy(col("content_md5"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .orderBy(col("content_md5"))
}
