package graft.udx

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The user-defined-function surface (SURVEY.md §2.3 Q33): scalar UDF,
  * typed Aggregator UDAF, and a Generator-backed UDTF, each registered
  * through the public extension points and exercised by an oracle-checked
  * query.
  */
object Udx {

  // ---- scalar UDF: the reference's FX conversion (O6) as a registered fn

  private val fxUsd: (Double, String) => Double = (amount, kind) =>
    kind match {
      case "purchase" => amount * 1.1
      case "click"    => amount * 1.3
      case _          => amount
    }

  /** Geometric mean as a typed Aggregator: buffer = (Σ ln x, n). */
  final case class GeoBuf(sumLog: Double, n: Long)
  object GeoMean extends Aggregator[Double, GeoBuf, Double] {
    override def zero: GeoBuf = GeoBuf(0.0, 0L)
    override def reduce(b: GeoBuf, x: Double): GeoBuf =
      GeoBuf(b.sumLog + math.log(x), b.n + 1)
    override def merge(a: GeoBuf, b: GeoBuf): GeoBuf =
      GeoBuf(a.sumLog + b.sumLog, a.n + b.n)
    override def finish(b: GeoBuf): Double =
      if (b.n == 0) Double.NaN else math.exp(b.sumLog / b.n)
    override def bufferEncoder: Encoder[GeoBuf] = Encoders.product[GeoBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def register(s: SparkSession): Unit = {
    s.udf.register("fx_usd", fxUsd)
    s.udf.register("geo_mean", udaf(GeoMean))
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tokenize_udtf", exprs => TokenizeUdtf(exprs.head), "built-in")
  }

  /** Scalar UDF through the SQL surface (matches Q03's semantics, so the
    * oracle is the same CASE expression).
    */
  def udxScalar(s: SparkSession, dir: String): DataFrame = {
    register(s)
    t(s, dir, "events")
      .select(col("event_id"),
        call_udf("fx_usd", col("value"), col("event_type")).as("v_usd"))
      .orderBy(col("event_id"))
  }

  /** Typed-Aggregator UDAF: geometric mean of quantities per return flag.
    * exp(Σln/n): partial-aggregated (map-side combine) like any built-in.
    */
  def udxUdaf(s: SparkSession, dir: String): DataFrame = {
    register(s)
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(call_udf("geo_mean", col("l_quantity")), 6).as("geo_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** Generator-backed UDTF via LATERAL VIEW: tokenize → one row per token
    * with its position.
    */
  def udxUdtf(s: SparkSession, dir: String): DataFrame = {
    register(s)
    t(s, dir, "documents").filter(col("doc_id") < 5)
      .createOrReplaceTempView("udtf_docs")
    s.sql(
      """SELECT doc_id, idx, token
        |FROM udtf_docs
        |LATERAL VIEW tokenize_udtf(text) tk AS idx, token
        |ORDER BY doc_id, idx""".stripMargin)
  }
}

/** UDTF as a native Generator expression (not a UDF returning an array +
  * explode): rows stream out without materializing the token array.
  * Tokenization matches graft.functions.TextFunctions.tokens.
  */
case class TokenizeUdtf(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("idx", LongType, nullable = false),
    StructField("token", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    // UTF8String.toLowerCase = Spark's lower(): locale-independent, so
    // tokens match TextFunctions.tokens under any default JVM locale
    else v.asInstanceOf[UTF8String].toLowerCase.toString.split("[^a-z0-9]+").iterator
      .filter(_.nonEmpty).zipWithIndex
      .map { case (tok, i) =>
        InternalRow(i.toLong + 1L, UTF8String.fromString(tok))
      }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
