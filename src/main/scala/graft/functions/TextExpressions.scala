package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused codegen'd replacements for the two hottest text primitives.
  *
  * `tokens` was `regexp_extract_all(lower(text), "[a-z0-9]+", 0)` — a
  * java.util.regex Matcher per row. `AsciiTokens` computes the identical
  * result with one unicode lowercase (the same `UTF8String.toLowerCase`
  * the Lower expression calls, so İ/ß expansions behave identically) and
  * a single byte scan: the pattern's match set is pure ASCII, and UTF-8
  * continuation/lead bytes all have the high bit set, so a byte-level run
  * scan over the lowered bytes is exactly the code-point regex semantics,
  * and each token is a zero-copy byte slice.
  *
  * `shingles3` was transform(sequence)+concat_ws+array_distinct — five
  * expression layers allocating three intermediate arrays per row.
  * `Shingles3` emits the distinct 3-gram strings in first-occurrence
  * order (array_distinct's contract) in one pass with one hash set.
  *
  * Both keep whole-stage codegen via static helper calls (the loop
  * bodies are data-dependent, so the helper call is the codegen form —
  * same pattern as the sketch/vector expressions in this package).
  */
case class AsciiTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ascii_tokens"

  protected override def nullSafeEval(input: Any): Any =
    AsciiTokens.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.AsciiTokens.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): AsciiTokens =
    copy(child = newChild)
}

object AsciiTokens {
  /** Static entry shared by eval and generated code. */
  def tokenize(s: UTF8String): ArrayData = {
    val b = s.toLowerCase.getBytes
    val out = new java.util.ArrayList[UTF8String](16)
    var i = 0
    var start = -1
    while (i < b.length) {
      val c = b(i)
      val tok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (tok && start < 0) start = i
      else if (!tok && start >= 0) {
        out.add(UTF8String.fromBytes(b, start, i - start)); start = -1
      }
      i += 1
    }
    if (start >= 0) out.add(UTF8String.fromBytes(b, start, b.length - start))
    new GenericArrayData(out.toArray)
  }
}

case class Shingles3(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles3"

  protected override def nullSafeEval(input: Any): Any =
    Shingles3.shingle(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Shingles3.shingle($c)")

  override protected def withNewChildInternal(newChild: Expression): Shingles3 =
    copy(child = newChild)
}

/** Content-defined chunking (the storage-dedup primitive applied to
  * text): a cut falls after byte position p whenever the polynomial hash
  * of the trailing 8-byte window — the same fold as [[RollingHash]],
  * init 0, mod 10¹⁵+37 — is ≡ 0 (mod 64), giving ~64-byte
  * expected chunks whose boundaries depend only on LOCAL content.
  * Insertions/deletions re-align after one window, so shared runs
  * between documents keep producing identical chunks — the
  * shift-resistance the fixed-tile span dedup (`text_span_dedup`)
  * definitionally lacks. The final chunk always ends at the last byte.
  * Input is expected to be the normalized ASCII form (lower + non-alnum
  * collapsed), which makes byte positions = character positions and the
  * DuckDB oracle's `ord(substr(...))` replication exact.
  */
case class CdcChunks(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  protected override def nullSafeEval(input: Any): Any =
    CdcChunks.chunks(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcChunks.chunks($c)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  private val M = 1000000000000037L
  private val W = 8

  def chunks(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    val out = new java.util.ArrayList[UTF8String](8)
    var prev = 0
    var p = W // exclusive end of the candidate window, in bytes
    while (p <= n) {
      var h = 0L
      var j = p - W
      while (j < p) { h = (h * 257L + (b(j) & 0xffL)) % M; j += 1 }
      if (h % 64L == 0L && p > prev) {
        out.add(UTF8String.fromBytes(b, prev, p - prev)); prev = p
      }
      p += 1
    }
    if (prev < n) out.add(UTF8String.fromBytes(b, prev, n - prev))
    new GenericArrayData(out.toArray)
  }
}

object Shingles3 {
  private val Space = ' '.toByte

  /** Distinct space-joined 3-grams in first-occurrence order — the
    * array_distinct(transform(...)) contract, one pass, one set.
    */
  def shingle(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    var i = 0
    while (i + 2 < n) {
      val a = toks.getUTF8String(i)
      val b = toks.getUTF8String(i + 1)
      val c = toks.getUTF8String(i + 2)
      val ab = a.getBytes; val bb = b.getBytes; val cb = c.getBytes
      val buf = new Array[Byte](ab.length + bb.length + cb.length + 2)
      System.arraycopy(ab, 0, buf, 0, ab.length)
      buf(ab.length) = Space
      System.arraycopy(bb, 0, buf, ab.length + 1, bb.length)
      buf(ab.length + bb.length + 1) = Space
      System.arraycopy(cb, 0, buf, ab.length + bb.length + 2, cb.length)
      seen.add(UTF8String.fromBytes(buf))
      i += 1
    }
    new GenericArrayData(seen.toArray)
  }
}
