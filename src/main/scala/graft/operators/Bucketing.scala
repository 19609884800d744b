package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (pre-partitioned) tables and the zero-shuffle co-located
  * join they enable — the write-once/join-many layout play for fact-fact
  * joins at 100 TB.
  *
  * A shuffle join of two 100 TB fact tables moves both sides over the
  * network EVERY time the join runs. Bucketing pays that partitioning
  * once at write time: both tables are hash-clustered into the same
  * number of buckets on the join key, so every subsequent equi-join on
  * that key is planned with NO Exchange on either side — each task joins
  * bucket i against bucket i locally. This is Spark's native analog of
  * the reference stack's keyed-state co-location (a keyed stream is
  * "bucketed" by the key partitioner; `/root/reference/src/main/java/com/
  * example/TransactionProcessor.java:89-116` relies on Kafka's topic
  * partitioning the same way).
  *
  * `sortBy` on the bucket key additionally makes each bucket file
  * sort-merge-joinable without a per-task sort (Spark still plans the
  * Sort but it is cheap on presorted runs; the Exchange elimination is
  * the scale win — PlanSpec asserts it).
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (overwriting), bucketed and
    * sorted by `key` into `nBuckets` buckets.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      nBuckets: Int): Unit = {
    val s = df.sparkSession
    // the default in-memory catalog forgets tables across sessions but
    // their managed locations remain on disk — CREATE would then refuse
    // the non-empty location. Drop both the stale registration and the
    // leftover directory before writing.
    s.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = s.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Bucket `orders` and `lineitem` on the order key, then run the
    * classic fact-fact join + aggregation entirely shuffle-free on the
    * fact side: revenue and line counts per order priority. The only
    * exchange in the plan is the final tiny aggregation on the 5-value
    * priority key. Result is layout-independent (same rows as the plain
    * join), which is exactly what the DuckDB oracle checks.
    */
  def q04bBucketedJoin(s: SparkSession, dir: String,
      nBuckets: Int = 8): DataFrame = {
    // write-once/join-many: the bucketed layout is the durable artifact,
    // so it is built only if this session hasn't built it for this data
    // dir yet (dir-keyed names — a same-session call on different data
    // gets its own tables; cross-session staleness is handled inside
    // writeBucketed). First call pays the layout write; every later call
    // — and the bench's steady-state pass — measures the join-many path,
    // which is what the operator exists for.
    val sfx = java.lang.Long.toHexString(
      java.util.UUID.nameUUIDFromBytes(dir.getBytes("UTF-8"))
        .getMostSignificantBits & Long.MaxValue)
    val ot = s"orders_bkt_$sfx"
    val lt = s"lineitem_bkt_$sfx"
    if (!s.catalog.tableExists(ot))
      writeBucketed(t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority")),
        ot, "o_orderkey", nBuckets)
    if (!s.catalog.tableExists(lt))
      writeBucketed(t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
        lt, "l_orderkey", nBuckets)
    s.table(lt)
      .join(s.table(ot),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        // shuffle-order-independent revenue: decimal products summed
        // exactly, one final cast back (the repo's oracle-parity recipe)
        sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderpriority"))
  }

  /** The join subplan alone (no agg), for plan assertions: bucketed
    * scan ⋈ bucketed scan with zero Exchange operators.
    */
  def bucketedJoinPlan(s: SparkSession): DataFrame =
    s.table("lineitem_bkt")
      .join(s.table("orders_bkt"), col("l_orderkey") === col("o_orderkey"))
}
