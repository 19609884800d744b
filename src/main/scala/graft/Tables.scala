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
      // events.ts has shipped as parquet TIMESTAMP(NANOS) (older testdata
      // generations — Spark's vectorized reader rejects it outright) and
      // as TIMESTAMP(MICROS) without a zone (current). Sniff the footer
      // type and normalize every generation to one stable session-zoned
      // TimestampType column so downstream queries never see the drift.
      // The legacy nanosAsLong flag is scoped to the (eager) schema
      // inference only — it makes a NANOS column infer as LongType instead
      // of erroring, and leaves MICROS/MILLIS inference untouched — so no
      // session-global conf leaks to other reads.
      val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = spark.conf.getOption(nanosKey)
      val schema =
        try { spark.conf.set(nanosKey, "true")
              spark.read.parquet(s"$dir/$name.parquet").schema }
        finally prev.fold(spark.conf.unset(nanosKey))(spark.conf.set(nanosKey, _))
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      schema("ts").dataType match {
        case LongType =>
          // TIMESTAMP(NANOS) read as raw epoch-nanos via the explicit user
          // schema; narrow to micros ourselves (data is µs-granular, so
          // lossless). Integral `div`, not `/`: double division would lose
          // precision above 2^53 (epoch-nanos are ~1.7e18).
          spark.read.schema(schema).parquet(s"$dir/$name.parquet")
            .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          // zone-less micros: under the UTC session tz pinned in
          // GraftSession.builder this cast is a wall-clock identity, so the
          // resulting instants match what the nanos path produced on the
          // older testdata generation.
          spark.read.parquet(s"$dir/$name.parquet")
            .withColumn("ts", col("ts").cast(TimestampType))
        case _ =>
          // already session-zoned TimestampType — pass through
          spark.read.parquet(s"$dir/$name.parquet")
      }
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
    *
    * Per-table fault isolation: one undecodable source must darken only
    * the queries that actually read it, never the whole SQL surface (in
    * round 8 an events decode drift took all 25+ `spark.sql` queries down
    * with it). Failures are reported, not swallowed silently.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      try t(spark, dir, n).createOrReplaceTempView(n)
      catch { case e: Exception =>
        System.err.println(s"[tables] failed to register '$n': ${e.getMessage}")
      }
    }
}
