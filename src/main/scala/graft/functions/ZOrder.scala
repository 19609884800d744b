package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Morton (Z-order) interleave of the low 16 bits of two longs:
  * bit i of x lands at position 2i, bit i of y at 2i+1. Sorting or
  * range-partitioning by the interleaved value clusters rows that are
  * close in BOTH dimensions — the write-time data-layout primitive
  * behind multi-column min/max scan pruning (Delta/Iceberg OPTIMIZE
  * ZORDER does exactly this; here it's a first-class codegen'd
  * expression usable in any repartitionByRange/sortWithinPartitions).
  *
  * Callers quantize each dimension to 16 bits first (e.g. rank/65536 or
  * value-range buckets); the expression masks inputs to 16 bits so the
  * result is always a non-negative 32-bit value in a long.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  // ExpectsInputTypes is unusable here (AbstractDataType is private[sql]
  // in Spark 4), so enforce the contract directly: without this, an INT
  // column through the SQL surface would ClassCastException at runtime
  // (or emit mistyped Java in codegen) instead of failing analysis.
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.DataTypeMismatch(
        errorSubClass = "UNEXPECTED_INPUT_TYPE",
        messageParameters = Map(
          "paramIndex" -> (if (left.dataType == LongType) "second" else "first"),
          "requiredType" -> "\"BIGINT\"",
          "inputSql" -> toString,
          "inputType" ->
            s""""${(if (left.dataType == LongType) right else left).dataType.sql}""""))
  }

  private def interleave(x: Long, y: Long): Long = {
    // classic bit-spread: spread16(v) puts bit i at position 2i
    def spread16(v: Long): Long = {
      var r = v & 0xffffL
      r = (r | (r << 8)) & 0x00ff00ffL
      r = (r | (r << 4)) & 0x0f0f0f0fL
      r = (r | (r << 2)) & 0x33333333L
      r = (r | (r << 1)) & 0x55555555L
      r
    }
    spread16(x) | (spread16(y) << 1)
  }

  override def nullSafeEval(x: Any, y: Any): Any =
    interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      s"""
         |long $rx = $x & 0xffffL;
         |$rx = ($rx | ($rx << 8)) & 0x00ff00ffL;
         |$rx = ($rx | ($rx << 4)) & 0x0f0f0f0fL;
         |$rx = ($rx | ($rx << 2)) & 0x33333333L;
         |$rx = ($rx | ($rx << 1)) & 0x55555555L;
         |long $ry = $y & 0xffffL;
         |$ry = ($ry | ($ry << 8)) & 0x00ff00ffL;
         |$ry = ($ry | ($ry << 4)) & 0x0f0f0f0fL;
         |$ry = ($ry | ($ry << 2)) & 0x33333333L;
         |$ry = ($ry | ($ry << 1)) & 0x55555555L;
         |${ev.value} = $rx | ($ry << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderFunction {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorder2", exprs => ZOrder2(exprs(0), exprs(1)), "built-in")

  def zorder2(x: Column, y: Column): Column = call_function("zorder2", x, y)
}
