package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Round-7 additions: the real ImageIO media codec (stub replacement).
  * The closed-form expectations here mirror the DuckDB oracle arithmetic
  * exactly, so a spec pass plus a gate hash-match certify the same thing
  * from two directions: bytes really encoded, really decoded.
  */
class Round7Spec extends SparkSpecBase {

  /** The oracle's closed form: (width, height, frames, channels, px_sum). */
  private def expectedMeta(d: Long): (Long, Long, Long, Long, Long) = {
    val w = 8 + d % 9; val h = 8 + d % 7; val b = d % 64
    val f = if (d % 2 == 0) 1L else 1 + d % 4
    val px = 3 * (w * h * (f * b + f * (f - 1) / 2) +
      f * (h * (w * (w - 1) / 2) + w * (h * (h - 1) / 2)))
    (w, h, f, 3L, px)
  }

  test("media payloads are real PNGs; ImageIO decode round-trips the closed form") {
    (0L to 40L).foreach { d =>
      val kind = if (d % 2 == 0) "image" else "video"
      val payload = Multimodal.encodePayload(d, kind)
      if (kind == "image") {
        // PNG signature on the wire, and ImageIO itself accepts the bytes
        assert((payload(0) & 0xff) == 0x89 && payload(1) == 'P' &&
          payload(2) == 'N' && payload(3) == 'G')
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        assert(img != null && img.getWidth == 8 + (d % 9).toInt)
      }
      val m = Multimodal.decodePayload(Multimodal.MediaAsset(d, payload, kind))
      val (w, h, f, c, px) = expectedMeta(d)
      assert(m.width == w && m.height == h, s"doc $d dims")
      assert(m.n_frames == f, s"doc $d frames")
      assert(m.channels == c, s"doc $d channels")
      assert(m.px_sum == px, s"doc $d px_sum: got ${m.px_sum}, want $px")
      // compressed size is real codec output: positive, matches payload
      assert(m.n_bytes == payload.length && m.n_bytes > 50)
    }
  }

  test("decodePayload rejects malformed media loudly") {
    val bad = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
    intercept[IllegalArgumentException] {
      Multimodal.decodePayload(Multimodal.MediaAsset(99L, bad, "image"))
    }
  }

  test("mm_media_meta decodes every sf0.001 asset to the oracle closed form") {
    val rows = Multimodal.mediaMeta(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getLong(0)
      val (w, h, f, c, px) = expectedMeta(d)
      assert(r.getLong(2) == w && r.getLong(3) == h && r.getLong(4) == c &&
        r.getLong(5) == f && r.getLong(6) == px, s"doc $d")
    }
  }

  test("frame sampling follows decoded frame counts") {
    val rows = Multimodal.frameSample(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getLong(0); val idx = r.getLong(1)
      assert(d % 2 == 1 && idx % 2 == 0 && idx < 1 + d % 4)
    }
  }
}
