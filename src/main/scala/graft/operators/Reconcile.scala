package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — the diff between two versions of a keyed
  * table (added / removed / changed rows), the audit primitive behind
  * incremental re-ingestion and CDC validation.
  *
  * Scale shape: ONE key-partitioned full-outer join; the compared columns
  * travel as a single struct per side, and struct null-safe equality
  * (`<=>`) does the row comparison map-side after the join — no per-column
  * join conditions, no second pass. Unchanged keys (the overwhelming
  * majority in practice) are filtered before any downstream shuffle.
  */
object Reconcile {

  /** Batch MERGE (SCD1 upsert semantics): apply a changeset of
    * inserts/updates/deletes to a keyed snapshot in ONE key-partitioned
    * full-outer join — the inverse of [[tableDiff]], and the batch twin
    * of the streaming upsert sink. Row rules: D drops the key, I/U take
    * the changeset's values, keys absent from the changeset keep the
    * base row. The changeset is normally ≪ base, so AQE broadcasts it;
    * at comparable sizes the join degrades to a key shuffle — either
    * way nothing rescans or sorts the snapshot.
    *
    * `changes` must carry `op` ('I' | 'U' | 'D'), the key, and the value
    * columns (ignored for D). One row per key on each side (CDC compact
    * form — collapse upstream if a batch can touch a key twice).
    */
  def applyChanges(base: DataFrame, changes: DataFrame, key: String,
      cols: Seq[String]): DataFrame = {
    val b = base.select(col(key).as("__k"), struct(cols.map(col): _*).as("__vb"))
    val c = changes.select(col(key).as("__k"), col("op"),
      struct(cols.map(col): _*).as("__vc"))
    b.join(c, Seq("__k"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(Seq(col("__k").as(key)) ++ cols.map(n =>
        when(col("op").isin("I", "U"), col("__vc").getField(n))
          .otherwise(col("__vb").getField(n)).as(n)): _*)
  }

  /** recon_merge — orders with a deterministic synthetic changeset
    * applied (same congruence classes as recon_diff: %97 deleted, %13
    * price-bumped, %101 re-inserted shifted): the merged snapshot.
    */
  def ordersMerge(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val cols = Seq("o_custkey", "o_orderstatus", "o_totalprice")
    val changes =
      o.filter(col("o_orderkey") % 101 === 0)
        .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
          col("o_custkey"), col("o_orderstatus"),
          (col("o_totalprice") + 5.0).as("o_totalprice"), lit("I").as("op"))
      .unionAll(o.filter(col("o_orderkey") % 13 === 0 &&
          col("o_orderkey") % 97 =!= 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          (col("o_totalprice") + 10.0).as("o_totalprice"), lit("U").as("op")))
      .unionAll(o.filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey"), lit(null).cast("long").as("o_custkey"),
          lit(null).cast("string").as("o_orderstatus"),
          lit(null).cast("double").as("o_totalprice"), lit("D").as("op")))
    applyChanges(o, changes, "o_orderkey", cols)
      .orderBy(col("o_orderkey"))
  }

  /** Rows whose `key` is present in exactly one side, or present in both
    * with any of `cols` differing (null-safe). Output: key, change tag,
    * and both value structs (null on the absent side).
    */
  /** Bucketed content fingerprint of a keyed table — the 100 TB-friendly
    * FIRST pass of snapshot reconciliation: before paying the full-outer
    * diff join, compare two tables' fingerprints (buckets × 16 bytes) and
    * drill [[tableDiff]] into mismatched buckets only. One scan, all
    * hashing map-side, one `buckets`-row aggregation:
    *
    *   bucket  = md5-uniform hash of the key, mod `buckets`
    *   xor_fp  = bit-XOR of each row's 60-bit md5 over its canonical
    *             `|`-joined column rendering (XOR is commutative — the
    *             fold is shuffle-order-independent by algebra, no decimal
    *             quantization needed)
    *
    * Any single-row difference flips its bucket's fingerprint; a pair of
    * differences colliding to the same fp is a 2^-60 event per bucket.
    * Columns are rendered as strings so the fingerprint is engine- and
    * layout-independent (ints/strings render identically everywhere;
    * float columns should be rounded by the caller first).
    */
  def fingerprint(df: DataFrame, key: String, cols: Seq[String],
      buckets: Int = 64): DataFrame = {
    val rendered = concat_ws("|", (key +: cols).map(c => col(c).cast("string")): _*)
    val keyHash = conv(substring(md5(col(key).cast("string").cast("binary")),
      1, 15), 16, 10).cast("long")
    val rowHash = conv(substring(md5(rendered.cast("binary")), 1, 15), 16, 10)
      .cast("long")
    df.select((keyHash % buckets).as("bucket"), rowHash.as("__h"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__h)").as("xor_fp"))
      .orderBy(col("bucket"))
  }

  /** recon_fingerprint — bucketed fingerprint of the orders table over
    * its key/status/customer columns.
    */
  def ordersFingerprint(s: SparkSession, dir: String): DataFrame =
    fingerprint(t(s, dir, "orders"), "o_orderkey",
      Seq("o_custkey", "o_orderstatus"))

  def tableDiff(a: DataFrame, b: DataFrame, key: String,
      cols: Seq[String]): DataFrame = {
    val ja = a.select(col(key).as("__k"), struct(cols.map(col): _*).as("val_a"))
    val jb = b.select(col(key).as("__k"), struct(cols.map(col): _*).as("val_b"))
    ja.join(jb, Seq("__k"), "full_outer")
      .withColumn("change",
        when(col("val_a").isNull, "added")
          .when(col("val_b").isNull, "removed")
          .when(!(col("val_a") <=> col("val_b")), "changed"))
      .filter(col("change").isNotNull)
      .withColumnRenamed("__k", key)
  }

  /** recon_diff — orders vs a deterministic synthetic next snapshot
    * (keys ≡0 mod 97 deleted, prices of keys ≡0 mod 13 bumped by +10,
    * keys ≡0 mod 101 re-inserted shifted by 10M): the three change kinds
    * all fire. Arithmetic is an exact double +10, so no cross-engine
    * rounding enters the comparison.
    */
  def reconOrders(s: SparkSession, dir: String): DataFrame = {
    val cur = t(s, dir, "orders")
    val next = cur.filter(pmod(col("o_orderkey"), lit(97)) =!= 0)
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(13)) === 0, col("o_totalprice") + 10.0)
          .otherwise(col("o_totalprice")))
      .unionByName(
        cur.filter(pmod(col("o_orderkey"), lit(101)) === 0)
          .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L)))
    tableDiff(cur, next, "o_orderkey", Seq("o_totalprice"))
      .select(col("o_orderkey"), col("change"),
        col("val_a.o_totalprice").as("price_a"),
        col("val_b.o_totalprice").as("price_b"))
      .orderBy(col("o_orderkey"), col("change"))
  }
}
