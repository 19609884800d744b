package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's UTF-8 bytes:
  * h₀ = 0; hᵢ = (hᵢ₋₁ · 257 + byteᵢ) mod (10¹⁵ + 37) — the document
  * fingerprint primitive (cheap, incremental, order-sensitive, unlike the
  * set-semantics MinHash). Native codegen'd expression: one fused loop
  * over the bytes, no allocation.
  *
  * The modulus keeps every intermediate ≤ ~2.6e17 (< 2⁶³), so the same
  * fold is expressible in engines with checked 64-bit arithmetic — the
  * DuckDB oracle replicates it with list_reduce (see SparkEntry).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 257L + (bytes(i) & 0xffL)) % 1000000000000037L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |final byte[] $bytes = $s.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 257L + ($bytes[$i] & 0xffL)) % 1000000000000037L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHashFunction {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "built-in")

  def rollingHash(c: Column): Column = call_function("rolling_hash", c)
}
