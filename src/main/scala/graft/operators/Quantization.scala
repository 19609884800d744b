package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Int8 embedding quantization — the memory-side scale play for vector
  * search: fp32 embeddings quantized to 8-bit codes shrink a 100 TB
  * vector corpus ~4x (and the scan/shuffle volume with it), at a small
  * recall cost that a rerank-on-exact stage recovers.
  *
  * Quantization must be SYMMETRIC (signed codes around zero, no offset):
  * an affine shift q = (v-lo)/step makes dot(q1,q2) carry per-vector
  * sum cross-terms, which destroys the ranking. With q = floor(v/step),
  * dot(q1,q2) ≈ dot(v1,v2)/step² — a monotone proxy for the true score.
  *
  * Everything here is ENGINE-DETERMINISTIC by construction, so unlike
  * the LSH/IVF ANN paths this one carries a full DuckDB hash oracle:
  *   - one global step = max(|corpus min|, |corpus max|)/127: min/max
  *     are exact, the step is one IEEE division;
  *   - codes = clamp(floor(v/step), -128, 127): floor, not round —
  *     Spark rounds HALF_UP where DuckDB rounds half-even, floor agrees
  *     bit-for-bit;
  *   - scores = INTEGER dot products of code vectors (≤ 128²·64 ≈ 1M,
  *     exactly representable everywhere), so ranking has no float
  *     tie-break hazard at all.
  */
object Quantization {

  /** Quantize an embedding column to signed long codes in [-128, 127]
    * given a step param column (from a broadcast 1-row frame).
    */
  def int8Codes(emb: Column, step: Column): Column =
    transform(emb, v =>
      least(greatest(floor(v.cast("double") / step), lit(-128.0)),
        lit(127.0)).cast("long"))

  /** Driver-gate query: top-k neighbors of vec_id 0 by int8-quantized
    * dot product (BIGINT scores, ties broken by vec_id). The corpus is
    * coded in one map-side pass against broadcast params; scoring is one
    * fused array pass per row; top-k is TakeOrderedAndProject — the same
    * no-corpus-shuffle shape as the exact q26 path.
    */
  def embQuantizedTopK(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val emb = t(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val prm = emb.select(
      (greatest(abs(min(array_min(col("embedding"))).cast("double")),
        abs(max(array_max(col("embedding"))).cast("double"))) / 127.0)
        .as("step"))
    val coded = emb.crossJoin(broadcast(prm))
      .select(col("vec_id"),
        int8Codes(col("embedding"), col("step")).as("q"))
    val probe = coded.filter(col("vec_id") === 0)
      .select(col("q").as("pq"))
    coded.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        aggregate(zip_with(col("q"), col("pq"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }
}
