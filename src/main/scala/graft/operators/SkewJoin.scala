package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew-salting for equi-joins whose key distribution AQE can't
  * fix (e.g. a single hot key that dominates one shuffle partition even
  * after AQE's skew-split, or engines/configs without AQE).
  *
  * The big side gets a deterministic salt in [0, salt); the small side is
  * replicated salt× via explode. The join key becomes (key, salt), so the
  * hot key's rows spread over `salt` reducers. Result is exactly the
  * plain inner join (the salt columns never leak).
  *
  * Cost model: replicating the small side salt× is worth it when
  * max_key_rows / avg_partition_rows ≫ salt — the usual dim-vs-fact
  * skew shape. At 100 TB this composes with (not replaces) AQE:
  * spark.sql.adaptive.skewJoin handles moderate skew, salting handles
  * pathological single-key skew.
  */
object SkewJoin {

  def saltedInnerJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int): DataFrame = {
    require(salt > 0)
    // deterministic pseudo-random salt from the full row (not the key —
    // salting by key alone would put each hot key back on one reducer)
    val saltCol: Column = pmod(
      xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(salt))
    val bigSalted = big.withColumn("__salt", saltCol)
    val smallSalted = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    bigSalted.join(smallSalted, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }

  /** Driver-gate query: the lineitem⋈orders fact join through the salted
    * path (salt 8), aggregated per order priority. The salt never leaks,
    * so the oracle is the PLAIN join's SQL — identity with the unsalted
    * result is exactly the operator's contract.
    */
  def q04cSaltedJoin(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import graft.Tables.t
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val o = t(s, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    saltedInnerJoin(li, o, "l_orderkey", 8)
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderpriority"))
  }
}
