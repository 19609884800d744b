package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table registry over the driver parquet testdata (TESTDATA.md).
  *
  * Mirrors the reference's catalog registration (O12,
  * TransactionProcessor.java:89,130,168): names resolve to configured
  * sources. Here the sources are parquet dirs; the streaming package has
  * the Kafka/memory analogues.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects. Read it as raw nanos and narrow to micros
      // ourselves (the data is µs-granular, so this is lossless).
      // The legacy nanosAsLong flag is scoped to the (eager) schema
      // inference only — execution accepts nanos→long via the explicit
      // user schema, so no session-global conf leaks to other reads.
      val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = spark.conf.getOption(nanosKey)
      val schema =
        try { spark.conf.set(nanosKey, "true")
              spark.read.parquet(s"$dir/$name.parquet").schema }
        finally prev.fold(spark.conf.unset(nanosKey))(spark.conf.set(nanosKey, _))
      spark.read.schema(schema).parquet(s"$dir/$name.parquet")
        // integral `div`, not `/`: double division would lose precision
        // above 2^53 (epoch-nanos are ~1.7e18)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else if (name == "documents") {
      // documents ships as one small parquet file → one input partition →
      // the regex/shingle-heavy text operators run single-threaded until
      // their first shuffle. Spread the rows across the shuffle
      // parallelism up front (tiny data, big downstream CPU).
      spark.read.parquet(s"$dir/$name.parquet").repartition(col("doc_id"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every testdata table as a temp view so `spark.sql` queries
    * (subqueries, SQL-surface checks) resolve by name — same names the
    * DuckDB oracle uses.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
