package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted in distributed batches.
  *
  * The media payloads are REAL encoded images: each document gets a
  * deterministic PNG (or, for "video" assets, a length-prefixed container
  * of per-frame PNGs) generated with `javax.imageio` partition-locally,
  * and the decode stage genuinely parses the container and decodes the
  * PNG bytes back with `ImageIO.read` — byte-level codec work, not
  * arithmetic on the payload. The generation rule is chosen so every
  * decoded property (width, height, channels, frame count, pixel sum)
  * has a closed-form integer expression in the doc_id, which is what the
  * DuckDB oracle recomputes: a hash match therefore certifies the decoded
  * bytes, not the generator.
  *
  * Generation rule (doc d): width = 8 + d%9, height = 8 + d%7,
  * base = d%64, kind = image (even d, raw PNG) / video (odd d, GMV1
  * container of 1 + d%4 frames); pixel (x,y) of frame k carries gray
  * value base + x + y + k on all three RGB channels. The value never
  * exceeds 63+15+13+3 = 94 < 256, so the per-asset pixel sum has the
  * wrap-free closed form
  * `3·(w·h·(F·base + F(F−1)/2) + F·(h·w(w−1)/2 + w·h(h−1)/2))`.
  */
object Multimodal {

  /** A media asset: id + raw encoded payload + declared kind. */
  final case class MediaAsset(doc_id: Long, payload: Array[Byte], kind: String)

  /** Decoded metadata: everything below `n_bytes` comes out of the codec
    * (ImageIO raster reads), not the generator's parameters.
    */
  final case class MediaMeta(doc_id: Long, kind: String, n_bytes: Long,
      width: Long, height: Long, channels: Long, n_frames: Long, px_sum: Long)

  private val ContainerMagic = "GMV1".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private def framesFor(d: Long, kind: String): Int =
    if (kind == "image") 1 else 1 + (d % 4).toInt

  /** One deterministic RGB PNG frame for doc `d`: real `ImageIO.write`
    * output (zlib-compressed truecolor PNG), not a synthetic header.
    */
  private def pngFrame(d: Long, frame: Int): Array[Byte] = {
    val w = 8 + (d % 9).toInt
    val h = 8 + (d % 7).toInt
    val base = (d % 64).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = base + x + y + frame // ≤ 94, no wrap
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Full payload for doc `d`: a raw PNG for images; for videos the GMV1
    * container — magic, int32 frame count, then per frame int32 length +
    * PNG bytes (a real multi-frame binary format the decoder must parse).
    */
  private[graft] def encodePayload(d: Long, kind: String): Array[Byte] =
    if (kind == "image") pngFrame(d, 0)
    else {
      val f = framesFor(d, kind)
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.write(ContainerMagic)
      out.writeInt(f)
      (0 until f).foreach { k =>
        val png = pngFrame(d, k)
        out.writeInt(png.length)
        out.write(png)
      }
      out.flush()
      bos.toByteArray
    }

  /** Container parse: raw PNG → one frame; GMV1 → the framed PNG list.
    * Throws on any malformed payload — decode errors must surface, not
    * corrupt downstream stats (the permissive tier is the Avro-edge
    * pattern, applied where a pipeline wants dead-lettering instead).
    */
  private def splitFrames(docId: Long, payload: Array[Byte]): Seq[Array[Byte]] =
    if (payload.length >= 8 && (payload(0) & 0xff) == 0x89 &&
        payload(1) == 'P' && payload(2) == 'N' && payload(3) == 'G')
      Seq(payload)
    else {
      val in = new java.io.DataInputStream(
        new java.io.ByteArrayInputStream(payload))
      val magic = new Array[Byte](4)
      in.readFully(magic)
      require(java.util.Arrays.equals(magic, ContainerMagic),
        s"doc $docId: unknown media magic")
      val f = in.readInt()
      (0 until f).map { _ =>
        val len = in.readInt()
        val buf = new Array[Byte](len)
        in.readFully(buf)
        buf
      }
    }

  /** REAL DECODE of one asset: container parse + `ImageIO.read` of every
    * frame, pixel sum accumulated from the decoded raster samples.
    */
  private[graft] def decodePayload(a: MediaAsset): MediaMeta = {
    javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
    val frames = splitFrames(a.doc_id, a.payload)
    var pxSum = 0L
    var w = 0L; var h = 0L; var bands = 0L
    frames.foreach { png =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      require(img != null, s"doc ${a.doc_id}: ImageIO failed to decode frame")
      val r = img.getRaster
      w = img.getWidth.toLong; h = img.getHeight.toLong
      bands = r.getNumBands.toLong
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          var b = 0
          while (b < r.getNumBands) {
            pxSum += r.getSample(x, y, b)
            b += 1
          }
          x += 1
        }
        y += 1
      }
    }
    MediaMeta(a.doc_id, a.kind, a.payload.length.toLong,
      w, h, bands, frames.size.toLong, pxSum)
  }

  /** The asset table: deterministic encoded payloads generated
    * partition-locally (one JVM codec per partition, no driver
    * involvement) — the parquet `binary` column shape a real multimodal
    * table carries, with genuinely decodable contents.
    */
  def assets(s: SparkSession, dir: String): Dataset[MediaAsset] =
    assetsOf(t(s, dir, "documents"))

  /** Library-facing form over any DataFrame with a doc_id column. */
  def assetsOf(ids: DataFrame): Dataset[MediaAsset] = {
    val s = ids.sparkSession
    import s.implicits._
    ids
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0, "image").otherwise("video").as("kind"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (d, kind) =>
        MediaAsset(d, encodePayload(d, kind), kind)
      })
  }

  /** Distributed decode: mapPartitions over the typed Dataset — one
    * decoder per partition (ImageIO init amortized), no driver
    * involvement, output re-enters Catalyst with a full schema. The
    * mapPartitions is load-bearing: no Catalyst expression can run an
    * image codec.
    */
  def decodeMeta(s: SparkSession, dir: String): Dataset[MediaMeta] = {
    import s.implicits._
    assets(s, dir).mapPartitions(_.map(decodePayload))
  }

  /** mm_media_meta — per-asset decoded properties. Every emitted column
    * is read back out of the decoded raster (or the parsed container);
    * the oracle recomputes them from the closed-form generation rule, so
    * the hash gate certifies the decode. `n_bytes` (the real compressed
    * payload size) is codec-dependent and therefore spec-checked, not
    * emitted here.
    */
  def mediaMeta(s: SparkSession, dir: String): DataFrame =
    decodeMeta(s, dir).toDF()
      .select(col("doc_id"), col("kind"), col("width"), col("height"),
        col("channels"), col("n_frames"), col("px_sum"))
      .orderBy(col("doc_id"))

  /** Frame sampling plumbing: every k-th frame of video assets as its
    * own row — the explode shape a video pipeline uses, driven by the
    * DECODED frame count.
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

  /** Feature extraction over the documents' text: 16-bin
    * character-distribution histogram per document — the per-asset
    * fingerprint shape an image/audio featurizer would emit. Fully
    * distributed: explode to one row per character position, one keyed
    * aggregation, fractions via the carried length.
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
    * `maxDim` (12 by default so the clamp genuinely bites on the 8–16
    * pixel corpus) — the metadata half of a resize stage; the pixel half
    * is [[resizeDecoded]].
    */
  def resizeMeta(s: SparkSession, dir: String, maxDim: Int = 12): DataFrame =
    decodeMeta(s, dir).toDF()
      .select(col("doc_id"), col("kind"), col("width"), col("height"),
        least(col("width"), lit(maxDim.toLong)).as("new_w"),
        least(col("height"), lit(maxDim.toLong)).as("new_h"))
      .orderBy(col("doc_id"))

  /** REAL pixel resize of one payload: every frame is decoded, resampled
    * to dim×dim by nearest neighbor (src pixel = (x'·w/dim, y'·h/dim),
    * integer floor — the deterministic sampling rule the oracle can
    * restate), re-encoded PNG, and the container reassembled. Byte-level
    * work end to end: ImageIO decode → raster loop → ImageIO encode.
    */
  private[graft] def resizePayload(docId: Long, payload: Array[Byte],
      dim: Int): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val resized = splitFrames(docId, payload).map { png =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      require(img != null, s"doc $docId: ImageIO failed to decode frame")
      val out = new java.awt.image.BufferedImage(
        dim, dim, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var yp = 0
      while (yp < dim) {
        var xp = 0
        while (xp < dim) {
          out.setRGB(xp, yp,
            img.getRGB(xp * img.getWidth / dim, yp * img.getHeight / dim))
          xp += 1
        }
        yp += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
    if (resized.size == 1) resized.head
    else {
      val bos = new java.io.ByteArrayOutputStream()
      val o = new java.io.DataOutputStream(bos)
      o.write(ContainerMagic)
      o.writeInt(resized.size)
      resized.foreach { png => o.writeInt(png.length); o.write(png) }
      o.flush()
      bos.toByteArray
    }
  }

  /** mm_resize_px — the pixel half of the resize stage, driver-gated:
    * decode → nearest-neighbor resample to 4×4 → re-encode → re-decode,
    * all in one mapPartitions pass (the production shape: transformed
    * payload bytes come out next to their new metadata). The emitted
    * stats are read from the SECOND decode, so the gate certifies the
    * full encode→transform→encode→decode chain; the oracle restates the
    * sampling rule as floor arithmetic.
    */
  def resizeDecoded(s: SparkSession, dir: String, dim: Int = 4): DataFrame = {
    import s.implicits._
    assets(s, dir)
      .mapPartitions(_.map { a =>
        decodePayload(MediaAsset(a.doc_id,
          resizePayload(a.doc_id, a.payload, dim), a.kind))
      })
      .toDF()
      .select(col("doc_id"), col("kind"), col("width").as("new_w"),
        col("height").as("new_h"), col("channels"), col("n_frames"),
        col("px_sum"))
      .orderBy(col("doc_id"))
  }

  /** mm_frame_stats — per-frame decode statistics: every frame of every
    * asset as its own row with its own decoded pixel sum (the per-frame
    * feature shape a video featurizer emits; images contribute their
    * single frame). flatMap keeps it one partition-local pass.
    */
  def frameStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    assets(s, dir)
      .flatMap { a =>
        javax.imageio.ImageIO.setUseCache(false)
        splitFrames(a.doc_id, a.payload).zipWithIndex.map { case (png, k) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(png))
          require(img != null, s"doc ${a.doc_id}: frame $k decode failed")
          val r = img.getRaster
          var sum = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              var b = 0
              while (b < r.getNumBands) { sum += r.getSample(x, y, b); b += 1 }
              x += 1
            }
            y += 1
          }
          (a.doc_id, k.toLong, sum)
        }
      }
      .toDF("doc_id", "frame_idx", "f_px_sum")
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  // ---- audio modality (WAV via javax.sound.sampled) ----

  /** An audio asset: doc_id + a REAL RIFF/WAVE payload written by
    * `AudioSystem.write` — 16-bit signed little-endian mono PCM at 8 kHz,
    * n = 64 + d%64 samples with amplitude base + i (base = d%64; peaks
    * ≤ 190, so sums are wrap-free and closed-form in d).
    */
  private[graft] def encodeWav(d: Long): Array[Byte] = {
    val n = 64 + (d % 64).toInt
    val base = (d % 64).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = base + i
      pcm(2 * i) = (v & 0xff).toByte // little-endian
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    // canonical 44-byte RIFF/WAVE PCM container, byte-identical to what
    // AudioSystem.write produces for this format (certified by the
    // codec-equivalence spec against encodeWavJdk). Hand-assembled
    // because AudioSystem's per-call provider lookup serializes on a
    // JVM-global registry: measured wall time for the 8x corpus was the
    // SAME at 4 and at 32 executor threads — the codec path flatlined
    // multi-core throughput, which at cluster scale would cap every
    // audio operator at single-thread speed per executor JVM.
    val dataSize = pcm.length
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(8000) // sample rate
      .putInt(16000) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
      .put(pcm)
    out.array()
  }

  /** The JDK-codec encoder the fast path is certified against (spec
    * asserts byte-identity); not used on the hot path.
    */
  private[graft] def encodeWavJdk(d: Long): Array[Byte] = {
    val n = 64 + (d % 64).toInt
    val base = (d % 64).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = base + i
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Parsed WAV container: format fields from the fmt chunk, raw PCM
    * bytes from the data chunk.
    */
  private[graft] final case class WavClip(
      channels: Int, sampleRate: Int, bitsPerSample: Int, pcm: Array[Byte]) {
    def frames: Long = pcm.length.toLong / (channels * bitsPerSample / 8)
  }

  /** REAL WAV DECODE, lock-free: a full RIFF chunk walk — verifies the
    * RIFF/WAVE magic, locates the fmt and data chunks wherever they sit
    * (skipping unknown chunks with even-byte padding, per spec), and
    * reads format/rate/width from the container, not the generator.
    * Replaces `AudioSystem.getAudioInputStream` on hot paths because the
    * JDK entry point takes a JVM-global provider-registry lock per call
    * (see encodeWav); decode-equivalence against the JDK codec is
    * certified by spec (`decodeWavJdk`).
    */
  private[graft] def parseWav(docId: Long, payload: Array[Byte]): WavClip = {
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", s"doc $docId: not a RIFF container")
    bb.getInt // declared riff size (trust the chunk walk, not this)
    require(fourcc() == "WAVE", s"doc $docId: RIFF but not WAVE")
    var channels = -1; var rate = -1; var bits = -1
    var pcm: Array[Byte] = null
    while (bb.remaining() >= 8 && (pcm == null || channels < 0)) {
      val id = fourcc(); val sz = bb.getInt
      id match {
        case "fmt " =>
          val fmtEnd = bb.position() + sz
          val audioFormat = bb.getShort
          require(audioFormat == 1, s"doc $docId: non-PCM WAV ($audioFormat)")
          channels = bb.getShort.toInt
          rate = bb.getInt
          bb.getInt // byte rate
          bb.getShort // block align
          bits = bb.getShort.toInt
          bb.position(fmtEnd)
        case "data" =>
          pcm = new Array[Byte](sz); bb.get(pcm)
        case _ => // skip unknown chunk, padded to even length
          bb.position(bb.position() + sz + (sz & 1))
      }
    }
    require(channels > 0 && pcm != null, s"doc $docId: missing fmt/data chunk")
    require(bits == 16, s"doc $docId: unexpected sample width $bits")
    WavClip(channels, rate, bits, pcm)
  }

  /** Decoded header fields + amplitude mass/energy of the PCM body
    * (signed little-endian 16-bit samples).
    */
  private[graft] def decodeWav(docId: Long, payload: Array[Byte]):
      (Long, Long, Long, Long, Long) = {
    val clip = parseWav(docId, payload)
    val body = clip.pcm
    var ampSum = 0L; var ampSq = 0L
    var i = 0
    while (i + 1 < body.length) {
      val v = ((body(i) & 0xff) | (body(i + 1) << 8)).toShort.toLong
      ampSum += v; ampSq += v * v
      i += 2
    }
    (clip.channels.toLong, clip.sampleRate.toLong, clip.frames, ampSum, ampSq)
  }

  /** The JDK-codec decode the chunk walker is certified against. */
  private[graft] def decodeWavJdk(docId: Long, payload: Array[Byte]):
      (Long, Long, Long, Long, Long) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
      s"doc $docId: unexpected WAV encoding $fmt")
    val n = ais.getFrameLength
    val body = ais.readAllBytes()
    var ampSum = 0L; var ampSq = 0L
    var i = 0
    while (i + 1 < body.length) {
      val v = ((body(i) & 0xff) | (body(i + 1) << 8)).toShort.toLong
      ampSum += v; ampSq += v * v
      i += 2
    }
    (fmt.getChannels.toLong, fmt.getSampleRate.toLong, n, ampSum, ampSq)
  }

  /** mm_audio_meta — the audio modality end to end: WAV payloads
    * generated and decoded with the JDK codec partition-locally, gated
    * on decoded header fields + amplitude sums against the closed form
    * (Σ(b+i) = nb + n(n−1)/2, Σ(b+i)² = nb² + bn(n−1) + (n−1)n(2n−1)/6).
    */
  def audioMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { d =>
        val (ch, rate, n, ampSum, ampSq) = decodeWav(d, encodeWav(d))
        (d, ch, rate, n, ampSum, ampSq)
      })
      .toDF("doc_id", "channels", "sample_rate", "n_samples",
        "amp_sum", "amp_sq_sum")
      .orderBy(col("doc_id"))
  }

  /** mm_audio_trim — amplitude-threshold trimming (the silence-strip /
    * VAD-lite stage an audio-training pipeline runs before windowing):
    * decode the REAL WAV container, scan the PCM once for the first and
    * last sample with |amplitude| ≥ the threshold, and report the
    * trimmed span plus its exact amplitude sum. Pure map-side codec
    * work like the other audio operators; the oracle recomputes every
    * column from the closed-form generation rule (amplitude = base + i,
    * monotone — so the trim start is exactly max(0, τ − base) and the
    * kept amplitude sum is a closed arithmetic series), which certifies
    * the decode-side scan, not just the arithmetic.
    */
  def audioTrim(s: SparkSession, dir: String, threshold: Long = 32L): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { d =>
        val body = parseWav(d, encodeWav(d)).pcm
        val n = body.length / 2
        def amp(i: Int): Long =
          ((body(2 * i) & 0xff) | (body(2 * i + 1) << 8)).toShort.toLong
        var first = n
        var i = 0
        while (i < n && first == n) {
          if (math.abs(amp(i)) >= threshold) first = i; i += 1 }
        var last = -1
        i = n - 1
        while (i >= 0 && last < 0) {
          if (math.abs(amp(i)) >= threshold) last = i; i -= 1 }
        val kept = if (last < first) 0L else (last - first + 1).toLong
        var ampSum = 0L
        i = first
        while (i <= last) { ampSum += amp(i); i += 1 }
        (d, n.toLong, first.toLong, kept, ampSum)
      })
      .toDF("doc_id", "n_samples", "trim_start", "n_kept", "kept_amp_sum")
      .orderBy(col("doc_id"))
  }

  /** Container parse that decodes ONLY the frames `k % stride == 0`,
    * skipping the bytes of unsampled frames without touching the PNG
    * codec — the IO shape of fps-style video sampling: work proportional
    * to frames KEPT, not frames stored. Returns (totalFrames, decoded
    * sampled frames in order).
    */
  private def sampleFrames(docId: Long, payload: Array[Byte], stride: Int):
      (Int, Seq[java.awt.image.BufferedImage]) = {
    javax.imageio.ImageIO.setUseCache(false)
    val frames = splitFrames(docId, payload)
    val sampled = frames.zipWithIndex.collect {
      case (png, k) if k % stride == 0 =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(png))
        require(img != null, s"doc $docId: sampled frame $k decode failed")
        img
    }
    (frames.size, sampled)
  }

  /** mm_frame_sample_px — the pixel half of temporal subsampling (the
    * metadata half is [[frameSample]]): keep every `stride`-th frame,
    * decode only those, and emit per-doc counts + the pixel mass of the
    * KEPT frames. The oracle recomputes the closed form over the sampled
    * frame indices, so a hash match certifies both the sampling rule and
    * the decoded pixel values.
    */
  def frameSampleDecoded(s: SparkSession, dir: String, stride: Int = 2): DataFrame = {
    import s.implicits._
    assets(s, dir)
      .mapPartitions(_.map { a =>
        val (total, sampled) = sampleFrames(a.doc_id, a.payload, stride)
        var pxSum = 0L
        sampled.foreach { img =>
          val r = img.getRaster
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              var b = 0
              while (b < r.getNumBands) { pxSum += r.getSample(x, y, b); b += 1 }
              x += 1
            }
            y += 1
          }
        }
        (a.doc_id, a.kind, total.toLong, sampled.size.toLong, pxSum)
      })
      .toDF("doc_id", "kind", "n_frames", "n_sampled", "px_sum_sampled")
      .orderBy(col("doc_id"))
  }

  /** mm_audio_windows — fixed-size analysis windows over decoded PCM (the
    * spectrogram front-end shape): the WAV payload is decoded with the
    * JDK codec, then each run of `win` samples becomes one row carrying
    * its sample count, amplitude mass, and energy (Σ amp²) — all integer
    * sums so the DuckDB oracle reproduces them bit-exactly from the
    * closed-form sample rule. Windowing happens in the same partition-
    * local pass as the decode; the only shuffle is the gate's ORDER BY.
    */
  def audioWindows(s: SparkSession, dir: String, win: Int = 16): DataFrame =
    audioWindowsOf(t(s, dir, "documents"), win)

  /** Library-facing form over any DataFrame with a doc_id column. */
  def audioWindowsOf(ids: DataFrame, win: Int): DataFrame = {
    val s = ids.sparkSession
    import s.implicits._
    ids
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { d =>
        val payload = encodeWav(d)
        val body = parseWav(d, payload).pcm
        val n = body.length / 2
        (0 until (n + win - 1) / win).map { wi =>
          val lo = wi * win
          val hi = math.min(n, lo + win)
          var ampSum = 0L; var ampSq = 0L
          var i = lo
          while (i < hi) {
            val v = ((body(2 * i) & 0xff) | (body(2 * i + 1) << 8)).toShort.toLong
            ampSum += v; ampSq += v * v
            i += 1
          }
          (d, wi.toLong, (hi - lo).toLong, ampSum, ampSq)
        }
      })
      .toDF("doc_id", "window_idx", "n_samples_w", "amp_sum", "energy")
      .orderBy(col("doc_id"), col("window_idx"))
  }

  /** mm_media_quarantine — the media-codec twin of the Avro dead-letter
    * edge (`pipe_avro_quarantine`): a 100 TB media ingest WILL meet
    * corrupt files, and a decode error must quarantine the asset, not
    * kill the batch. Deterministic poison (every 25th doc: images get a
    * garbage magic, video containers lose their tail so the last
    * frame's `readFully` hits EOF) flows through a per-asset try/catch
    * in the same partition-local decode pass; errors classify by type
    * (`bad_magic` / `truncated`), good rows decode untouched. Gated on
    * per-disposition counts + the decoded pixel mass of the survivors —
    * which the oracle recomputes closed-form, proving the poison never
    * leaked into good rows.
    */
  def mediaQuarantine(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    assets(s, dir)
      .mapPartitions(_.map { a =>
        val payload =
          if (a.doc_id % 25 != 0) a.payload
          else if (a.kind == "image") {
            val p = a.payload.clone()
            p(0) = 0xde.toByte; p(1) = 0xad.toByte
            p(2) = 0xbe.toByte; p(3) = 0xef.toByte
            p
          } else a.payload.dropRight(10)
        try {
          val m = decodePayload(MediaAsset(a.doc_id, payload, a.kind))
          ("ok", m.px_sum)
        } catch {
          case _: IllegalArgumentException => ("bad_magic", 0L)
          case _: java.io.IOException => ("truncated", 0L)
        }
      })
      .toDF("disposition", "px")
      .groupBy(col("disposition"))
      .agg(count(lit(1)).as("n"), sum(col("px")).as("px_sum"))
      .orderBy(col("disposition"))
  }

  /** Audio envelope signature of one decoded payload: integer mean
    * amplitude of the first `nWin` full 16-sample windows — the coarse
    * loudness contour an audio fingerprinter keys on. Read from the
    * REAL codec output (the PCM bytes behind `getAudioInputStream`),
    * not the generator.
    */
  private def envelopeOf(payload: Array[Byte], nWin: Int): Array[Long] = {
    val body = parseWav(-1L, payload).pcm
    require(body.length >= 32 * nWin,
      s"clip has ${body.length / 2} samples, needs ${16 * nWin} for $nWin windows")
    Array.tabulate(nWin) { w =>
      var sum = 0L
      var i = 16 * w
      while (i < 16 * (w + 1)) {
        sum += ((body(2 * i) & 0xff) | (body(2 * i + 1) << 8)).toShort.toLong
        i += 1
      }
      sum / 16
    }
  }

  /** mm_audio_near_dup — audio near-duplicate pairing on the envelope
    * signature (the audio member of the near-dup family: text MinHash,
    * image aHash, audio envelope). Docs collapse to DISTINCT signatures
    * first; candidate pairs come from a width-(ε+1) bucket join on the
    * envelope's first window (a signature pair within ε everywhere has
    * first-window buckets differing by ≤ 1, so probing own+adjacent
    * buckets is COMPLETE); the exact verify checks max per-window |Δ|
    * ≤ ε. Kernel work ∝ candidate signature pairs — never corpus², the
    * same posture as every other near-dup family here.
    */
  def audioNearDup(s: SparkSession, dir: String, eps: Long = 2,
      nWin: Int = 4): DataFrame =
    audioNearDupOf(t(s, dir, "documents"), eps, nWin)

  /** Library-facing form over any DataFrame with a doc_id column. */
  def audioNearDupOf(ids: DataFrame, eps: Long, nWin: Int): DataFrame = {
    val s = ids.sparkSession
    import s.implicits._
    val sigs = ids.select(col("doc_id")).as[Long]
      .mapPartitions(_.map { d =>
        val env = envelopeOf(encodeWav(d), nWin)
        (d, env.toSeq, env.map(v => f"$v%02x").mkString)
      })
      .toDF("doc_id", "env", "sig")
    val cls = sigs.groupBy(col("sig"))
      .agg(first(col("env")).as("env"), count(lit(1)).as("n_docs"),
        min(element_at(col("env"), 1)).as("v0"))
    // probe own + both adjacent buckets: a qualifying pair's buckets
    // differ by ≤ 1, and the a<b output orientation must be reachable
    // whichever side is lexically smaller
    val probe = cls.select(col("sig"), col("env"), col("n_docs"),
      explode(array(floor(col("v0") / (eps + 1)) - 1,
        floor(col("v0") / (eps + 1)),
        floor(col("v0") / (eps + 1)) + 1)).as("bkt"))
    val build = cls.select(col("sig").as("b_sig"), col("env").as("b_env"),
      col("n_docs").as("b_n_docs"),
      floor(col("v0") / (eps + 1)).as("bkt"))
    probe.join(build, Seq("bkt"))
      .filter(col("sig") < col("b_sig"))
      .select(col("sig").as("sig_a"), col("b_sig").as("sig_b"),
        aggregate(zip_with(col("env"), col("b_env"),
            (a, b) => abs(a - b)),
          lit(0L), (acc, x) => greatest(acc, x)).as("max_delta"),
        col("n_docs").as("n_docs_a"), col("b_n_docs").as("n_docs_b"))
      .distinct() // a pair can meet in two buckets
      .filter(col("max_delta") <= eps)
      .orderBy(col("sig_a"), col("sig_b"))
  }

  /** 64-bit average hash (aHash) of one decoded frame: nearest-neighbor
    * resample to 8×8 (same floor rule as [[resizePayload]]), per-pixel
    * brightness s = r+g+b, bit(y·8+x) = 1 iff 64·s > Σs (mean threshold,
    * integer cross-multiplied — no floating-point mean). Returned as two
    * unsigned 32-bit halves so the hex form never touches the sign bit.
    */
  private[graft] def aHash(img: java.awt.image.BufferedImage): (Long, Long) = {
    val s = new Array[Long](64)
    var total = 0L
    var yp = 0
    while (yp < 8) {
      var xp = 0
      while (xp < 8) {
        val rgb = img.getRGB(xp * img.getWidth / 8, yp * img.getHeight / 8)
        val v = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        s(yp * 8 + xp) = v.toLong
        total += v
        xp += 1
      }
      yp += 1
    }
    var hi = 0L; var lo = 0L
    var i = 0
    while (i < 64) {
      if (64L * s(i) > total) {
        if (i >= 32) hi |= 1L << (i - 32) else lo |= 1L << i
      }
      i += 1
    }
    (hi, lo)
  }

  /** mm_ahash_dedup — perceptual-hash image dedup: every asset's FIRST
    * frame is decoded and aHashed from real pixels, assets sharing an
    * aHash form a duplicate group, and each group emits (hash, size,
    * keeper = min doc_id). The hash ignores brightness offsets by
    * construction (mean-threshold), so the generator's `base = d%64`
    * shift is invisible and the groups are exactly the (w,h,frame-0)
    * shape classes — which is what the oracle recomputes. At 100 TB this
    * is a map-side 8-byte hash + one keyed agg, the same posture as
    * exact dedup; hamming-near aHash pairing would reuse the SimHash
    * band-join (`Dedup.simhash`) over the same 64 bits.
    */
  def ahashDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    assets(s, dir)
      .mapPartitions(_.map { a =>
        val first = splitFrames(a.doc_id, a.payload).head
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(first))
        require(img != null, s"doc ${a.doc_id}: frame 0 decode failed")
        val (hi, lo) = aHash(img)
        (a.doc_id, f"$hi%08x$lo%08x")
      })
      .toDF("doc_id", "ahash")
      .groupBy(col("ahash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
      .orderBy(col("ahash"))
  }

  /** mm_pair_builder — contrastive (image, negative-image) training
    * pairs, the capstone composition of the multimodal and sampling
    * families: every asset's first frame is decoded and aHashed from
    * real pixels (the anchor), candidate negatives come from the
    * deterministic [[HashRing]] sampler (k draws per doc, RNG-free,
    * engine-reproducible), and a draw is VALID only when it lands on a
    * different doc whose image is perceptually different (aHash
    * differs) — the true-negative guard that keeps near-duplicate
    * images from becoming "negatives" and poisoning the contrastive
    * loss. The first valid draw per anchor wins (min-of-struct on the
    * draw index). Decode is partition-local; the ring lookup is the
    * as-of merge; hash joins carry 16-hex strings, never payloads.
    */
  def pairBuilder(s: SparkSession, dir: String, k: Int = 2,
      shardBits: Int = 4): DataFrame = {
    import s.implicits._
    val hashes = assets(s, dir)
      .mapPartitions(_.map { a =>
        val first = splitFrames(a.doc_id, a.payload).head
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(first))
        require(img != null, s"doc ${a.doc_id}: frame 0 decode failed")
        val (hi, lo) = aHash(img)
        (a.doc_id, f"$hi%08x$lo%08x")
      })
      .toDF("doc_id", "ahash")
    val draws = graft.operators.HashRing.successors(
      hashes.select(col("doc_id").as("nd")), k, shardBits)
    draws
      .join(hashes.select(col("doc_id").as("u"),
        col("ahash").as("anchor_hash")), "u")
      .join(hashes.select(col("doc_id").as("v"),
        col("ahash").as("neg_hash")), "v")
      .filter(col("v") =!= col("u") &&
        col("neg_hash") =!= col("anchor_hash"))
      .groupBy(col("u"))
      .agg(min(struct(col("i"), col("v"), col("neg_hash"))).as("c"),
        min(col("anchor_hash")).as("anchor_hash"))
      .select(col("u").as("doc_id"), col("anchor_hash"),
        col("c.v").as("neg_doc"), col("c.neg_hash").as("neg_hash"))
      .orderBy(col("doc_id"))
  }

  /** Distinct aHash classes of the corpus: (hi, lo, hex, member count).
    * The class table is the near-dup working set — at 100 TB the corpus
    * collapses to |distinct hashes| rows before any pairing happens.
    */
  private def ahashClasses(ids: DataFrame): DataFrame = {
    val s = ids.sparkSession
    import s.implicits._
    assetsOf(ids)
      .mapPartitions(_.map { a =>
        val first = splitFrames(a.doc_id, a.payload).head
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(first))
        require(img != null, s"doc ${a.doc_id}: frame 0 decode failed")
        val (hi, lo) = aHash(img)
        (a.doc_id, hi, lo)
      })
      .toDF("doc_id", "hi", "lo")
      .groupBy(col("hi"), col("lo"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("ahash", format_string("%08x%08x", col("hi"), col("lo")))
  }

  /** mm_ahash_near_dup — perceptual NEAR-duplicate pairing: aHash classes
    * within hamming distance `maxHamming` of each other. Candidates come
    * from a band self-join on the hash's 8 bytes — by pigeonhole, two
    * 64-bit hashes within hamming 7 differ in at most 7 of the 8 bytes,
    * so they agree on at least one band: the banding is COMPLETE for
    * `maxHamming ≤ 7`, never a heuristic (same recall argument as
    * `Dedup.simhash`, restated per byte). Verification is an exact
    * popcount over the two 32-bit halves (`bit_count(a^b)`), avoiding
    * any signed 64-bit reassembly in either engine. 100 TB posture: the
    * corpus collapses to distinct classes first, band join fans out 8
    * rows per class, and kernel work is proportional to candidate pairs
    * sharing a byte — never classes².
    */
  def ahashNearDup(s: SparkSession, dir: String, maxHamming: Int = 2): DataFrame =
    ahashNearDupOf(t(s, dir, "documents"), maxHamming)

  /** Library-facing form over any DataFrame with a doc_id column. */
  def ahashNearDupOf(ids: DataFrame, maxHamming: Int = 2): DataFrame = {
    require(maxHamming <= 7, "byte banding is only complete for hamming <= 7")
    val cls = ahashClasses(ids)
    val banded = cls.select(col("ahash"), col("hi"), col("lo"), col("n_docs"),
      explode(array((0 until 8).map { j =>
        val half = if (j < 4) col("lo") else col("hi")
        struct(lit(j).as("band"),
          shiftright(half, 8 * (j % 4)).bitwiseAND(lit(255L)).as("v"))
      }: _*)).as("bv"))
      .select(col("ahash"), col("hi"), col("lo"), col("n_docs"),
        col("bv.band").as("band"), col("bv.v").as("v"))
    val a = banded.select(banded.columns.map(c => col(c).as(s"a_$c")): _*)
    val b = banded.select(banded.columns.map(c => col(c).as(s"b_$c")): _*)
    a.join(b, col("a_band") === col("b_band") && col("a_v") === col("b_v") &&
        col("a_ahash") < col("b_ahash"))
      .select(col("a_ahash").as("ahash_a"), col("b_ahash").as("ahash_b"),
        (bitCount(col("a_hi").bitwiseXOR(col("b_hi"))) +
          bitCount(col("a_lo").bitwiseXOR(col("b_lo"))))
          .cast(LongType).as("hamming"),
        col("a_n_docs").as("n_docs_a"), col("b_n_docs").as("n_docs_b"))
      .distinct() // classes sharing several bands collide in several bands
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("ahash_a"), col("ahash_b"))
  }

  private def bitCount(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.bit_count(c)

  /** Materialize the corpus' media payloads as real files on disk —
    * the fixture stand-in for an object store full of media: one
    * `.png` per image doc, one `.gmv` container per video doc, written
    * by the EXECUTORS (foreachPartition; the driver never sees a
    * payload). Idempotent: names and bytes are deterministic, rewrite
    * via temp+rename so concurrent runs can't expose torn files.
    */
  private def materializeMediaDir(s: SparkSession, dir: String): String = {
    import s.implicits._
    // key the fixture dir on the corpus SHAPE, not just the path: a
    // regenerated corpus under the same path lands in a fresh directory
    // instead of mixing with stale files the glob would still list
    val shape = t(s, dir, "documents")
      .agg(count(lit(1)), min(col("doc_id")), max(col("doc_id"))).head
    val base = new java.io.File(
      sys.props("java.io.tmpdir"),
      "graft_media_" + Integer.toHexString(
        (dir, shape.getLong(0), shape.getLong(1), shape.getLong(2))
          .hashCode)).getAbsolutePath
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .foreachPartition { (it: Iterator[Long]) =>
        new java.io.File(base).mkdirs()
        it.foreach { d =>
          val kind = if (d % 2 == 0) "image" else "video"
          val ext = if (kind == "image") "png" else "gmv"
          val target = new java.io.File(base, f"doc_$d%06d.$ext")
          if (!target.exists) {
            val tmp = java.io.File.createTempFile(s"doc_$d", s".$ext.tmp",
              new java.io.File(base))
            val fos = new java.io.FileOutputStream(tmp)
            try fos.write(encodePayload(d, kind)) finally fos.close()
            if (!tmp.renameTo(target)) tmp.delete() // a peer won the race
          }
        }
      }
    base
  }

  /** mm_binary_files — media ingest through Spark's `binaryFile` source,
    * the production path for training data that lives as FILES in an
    * object store: `format("binaryFile")` with a `pathGlobFilter` so only
    * `*.png` images are listed (the same directory also holds `.gmv`
    * video containers — the filter is load-bearing), doc ids recovered
    * from the path, payloads decoded partition-locally. `len_ok` pins
    * the source's `length`/`content` contract against the decoder's own
    * byte count. At 100 TB the only change is the load path: an object
    * store URI with `recursiveFileLookup`, partition-parallel listing
    * and per-file decode exactly as here.
    */
  /** Shared decode stage for file-borne PNGs (batch and streaming take
    * the same path): doc id from the file name, payload through the real
    * codec, `len_ok` pinning the source's length/content contract.
    */
  private def decodePngFiles(files: DataFrame): DataFrame = {
    import files.sparkSession.implicits._
    files
      .select(col("path"), col("length"), col("content"))
      .as[(String, Long, Array[Byte])]
      .mapPartitions { it =>
        val id = "doc_(\\d+)\\.png".r
        it.map { case (path, len, content) =>
          val d = id.findFirstMatchIn(path)
            .getOrElse(sys.error(s"unrecognized media path $path"))
            .group(1).toLong
          val m = decodePayload(MediaAsset(d, content, "image"))
          (d, m.width, m.height, m.channels, m.n_frames, m.px_sum,
            if (len == content.length && len == m.n_bytes) 1L else 0L)
        }
      }
      .toDF("doc_id", "width", "height", "channels", "n_frames", "px_sum",
        "len_ok")
  }

  def binaryFileIngest(s: SparkSession, dir: String): DataFrame =
    decodePngFiles(
      s.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(materializeMediaDir(s, dir)))
      .orderBy(col("doc_id"))

  /** The binaryFile source's fixed schema — file streams require it
    * declared up front (no inference on a stream).
    */
  private val BinaryFileSchema = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** STREAMING media ingest: the same binaryFile + glob + decode chain
    * run as a file stream — media files landing in the directory are
    * discovered per micro-batch and decoded incrementally, which is how
    * a continuously-fed object-store prefix is consumed at 100 TB
    * (`maxFilesPerTrigger` bounds batch size there). Unordered: the
    * sink, not the source, owns ordering on a stream.
    */
  def binaryFileStream(s: SparkSession, mediaDir: String): DataFrame =
    decodePngFiles(
      s.readStream.format("binaryFile")
        .schema(BinaryFileSchema)
        .option("pathGlobFilter", "*.png")
        .load(mediaDir))

  /** STREAMING quarantine — where the dead-letter tier stops being
    * optional: a corrupt file in a FILE STREAM is not one lost batch
    * but a permanently poisoned source (the failed batch replays from
    * the checkpoint on every restart and kills the query again). The
    * permissive decode classifies per file in the same pass — good
    * files emit their decoded stats, poison emits a dead-letter row
    * with the error — and the stream keeps committing offsets past it.
    */
  def binaryFileStreamPermissive(s: SparkSession, mediaDir: String): DataFrame = {
    import s.implicits._
    s.readStream.format("binaryFile")
      .schema(BinaryFileSchema)
      .option("pathGlobFilter", "*.png")
      .load(mediaDir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        val id = "doc_(\\d+)\\.png".r
        it.map { case (path, content) =>
          val d = id.findFirstMatchIn(path).map(_.group(1).toLong).getOrElse(-1L)
          try {
            val m = decodePayload(MediaAsset(d, content, "image"))
            (d, "ok", m.px_sum, null: String)
          } catch {
            case e @ (_: IllegalArgumentException | _: java.io.IOException) =>
              (d, "dead_letter", 0L, e.getMessage)
          }
        }
      }
      .toDF("doc_id", "disposition", "px_sum", "error")
  }

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
    * declarative plan (the mm twin of pipe_clean_corpus): decode payloads
    * (real ImageIO, partition-local) → gate on decoded properties
    * (minimum width + pixel-mass floor) → exact content dedup keeping the
    * lowest doc_id per payload digest → join embeddings → per-label
    * survivor report. Every stage keeps its standalone scale shape: the
    * decode is partition-local, the gate map-side, the dedup shuffles
    * 16-byte digests (never the payload blobs), the embedding join is
    * key-partitioned, and the final report is one keyed count.
    */
  def mediaCuration(s: SparkSession, dir: String, minWidth: Long = 12,
      minPx: Long = 20000): DataFrame = {
    val meta = decodeMeta(s, dir).toDF()
      .filter(col("width") >= minWidth && col("px_sum") >= minPx)
    val digests = assets(s, dir).toDF()
      .select(col("doc_id"), md5(col("payload")).as("content_md5"))
    val keepers = meta.join(digests, "doc_id")
      .groupBy(col("content_md5")).agg(min(col("doc_id")).as("doc_id"))
    meta.join(keepers, "doc_id")
      .join(t(s, dir, "embeddings"), col("doc_id") === col("vec_id"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_assets"),
        sum(col("px_sum")).as("total_px"))
      .orderBy(col("label"))
  }

  /** mm_binary_dedup — exact dedup of OPAQUE binary payloads by content
    * hash: the store-level dedup of a media lake. The payload collapses
    * to its md5 map-side, so the shuffle carries 16-byte digests — never
    * megabyte blobs (grouping by the payload itself, the text-dedup
    * shape, would ship every asset through the exchange). Keeper = lowest
    * doc_id; only duplicated digests are reported. The digest itself is
    * codec-dependent, so the gate emits (keeper, n_copies) — md5 equality
    * is payload equality, which the oracle reproduces as equality of the
    * generation parameters (doc_id mod lcm(64,9,7,4) = 4032).
    */
  def binaryDedup(s: SparkSession, dir: String): DataFrame =
    assets(s, dir).toDF()
      .select(col("doc_id"), md5(col("payload")).as("content_md5"))
      .groupBy(col("content_md5"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .select(col("keeper"), col("n_copies"))
      .orderBy(col("keeper"))
}
