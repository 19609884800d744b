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

  /** Random-projection dimensionality reduction (the Johnson-
    * Lindenstrauss play, Achlioptas sign-matrix form): project 64-dim
    * float embeddings to `dOut` dims through a FIXED ±1/√dOut matrix —
    * the database-friendly JL construction, since a sign matrix needs no
    * gaussian sampling and the whole transform is one fused codegen'd
    * loop ([[graft.functions.MatrixProject]], matrix as a referenced
    * constant — the HyperplaneBucket rationale; the Column-tree form is
    * 1024 arithmetic nodes).
    *
    * Scale shape: pure map-side projection, zero shuffles, zero state —
    * the matrix is parameter-sized (dOut·64 doubles) and derived
    * deterministically from md5 parity, so ANY engine (and the DuckDB
    * oracle) rebuilds it bit-for-bit; at 100 TB this runs as a column
    * transform inside whatever scan already touches the vectors,
    * typically in front of ANN indexing (4× fewer bytes through every
    * downstream shuffle at dOut=16).
    *
    * Gate output keeps the first 4 projected coordinates plus the
    * per-vector norm ratio ‖y‖²/‖x‖² (the quantity JL says concentrates
    * near 1) — all engine-deterministic equalities, not statistical
    * envelopes.
    */
  def randomProjection(s: SparkSession, dir: String, dOut: Int = 16): DataFrame =
    randomProjectionOf(t(s, dir, "embeddings"), dOut)

  /** Library-facing form over any (vec_id, embedding) frame. */
  def randomProjectionOf(emb: DataFrame, dOut: Int = 16): DataFrame = {
    val s = emb.sparkSession
    graft.functions.VectorFunctions.register(s)
    val dim = 64
    def signOf(j: Int, i: Int): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rp_${j}_${i}".getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xF) % 2 == 0) 1.0 else -1.0
    }
    val scale = 1.0 / math.sqrt(dOut.toDouble)
    val matrix = Array.tabulate(dOut, dim)((j, i) => signOf(j, i) * scale)
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "matrix_project",
      exprs => graft.functions.MatrixProject(exprs.head, matrix), "built-in")
    emb
      .select(col("vec_id"),
        call_function("matrix_project", col("embedding")).as("y"),
        graft.functions.VectorFunctions
          .dotProduct(col("embedding"), col("embedding")).as("nx"))
      .select(col("vec_id"),
        round(element_at(col("y"), 1), 6).as("y1"),
        round(element_at(col("y"), 2), 6).as("y2"),
        round(element_at(col("y"), 3), 6).as("y3"),
        round(element_at(col("y"), 4), 6).as("y4"),
        round(aggregate(col("y"), lit(0.0), (a, v) => a + v * v) / col("nx"), 6)
          .as("norm_ratio"))
      .orderBy(col("vec_id"))
  }
}
