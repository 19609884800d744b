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

  /** Rows whose `key` is present in exactly one side, or present in both
    * with any of `cols` differing (null-safe). Output: key, change tag,
    * and both value structs (null on the absent side).
    */
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
