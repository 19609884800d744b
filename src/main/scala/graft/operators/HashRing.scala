package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Consistent hashing as a deterministic SAMPLER, shared by the graph
  * negative sampler and the multimodal contrastive-pair builder: every
  * id takes a position md5(id) on a 60-bit ring, probe i of id u lands
  * at md5(u:i), and the drawn candidate is the next id at-or-after the
  * probe (wrapping). Uniform (positions are md5-uniform), RNG-free, and
  * reproducible across runs and engines.
  *
  * The successor lookup is the AS-OF MERGE, never a product: ids and
  * probes shard by their top hash bits, interleave in ONE per-shard
  * (position, kind, id) sort, and a running last-non-null window over
  * the DESC order reads each probe's successor (the whole-partition
  * frame supplies the wrap-around id once per shard). See
  * [[Graph.negativeSampleOf]] for the probe history that forced the
  * merge form (a banded join + min-of-struct paid for the
  * |shard_nodes|·|shard_probes| product: 8× ratio 18.7 vs 1.05).
  *
  * `shardBits` grows with the id count; an empty shard would drop its
  * probes (shards ≪ ids keeps that improbable — documented, not
  * silent).
  */
object HashRing {

  private def h(c: Column) =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")

  /** `ids` must expose a single column `nd`; returns (u, i, v) — for
    * each id u and draw i < k, the ring successor v (possibly u
    * itself; callers reject self-hits per their own semantics).
    */
  def successors(ids: DataFrame, k: Int, shardBits: Int): DataFrame = {
    require(k > 0 && shardBits >= 0 && shardBits <= 16)
    val shardDiv = 1L << (60 - shardBits)
    val ring = ids
      .select(h(col("nd")).as("p"), lit(0).as("kind"), col("nd"),
        lit(null).cast("long").as("u"), lit(null).cast("int").as("i"))
      .unionByName(ids
        .select(col("nd").as("u"), explode(sequence(lit(0), lit(k - 1))).as("i"))
        .select(h(concat(col("u").cast("string"), lit(":"),
            col("i").cast("string"))).as("p"),
          lit(1).as("kind"), lit(null).cast(ids.schema("nd").dataType).as("nd"),
          col("u"), col("i")))
      .withColumn("shard", expr(s"p div $shardDiv"))
    val ord = Seq(col("p").desc, col("kind").asc, col("nd").desc_nulls_last)
    val wSucc = Window.partitionBy(col("shard")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wWrap = Window.partitionBy(col("shard")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ring
      .withColumn("succ", last(col("nd"), ignoreNulls = true).over(wSucc))
      .withColumn("frst", last(col("nd"), ignoreNulls = true).over(wWrap))
      .filter(col("kind") === 1)
      .select(col("u"), col("i").cast("long").as("i"),
        coalesce(col("succ"), col("frst")).as("v"))
  }
}
