package graft.tools

import org.apache.spark.sql.functions._

/** A/B timing of the two simhash signature forms (dev tool):
  * explode+groupBy agg vs single map-side expression.
  */
object SigBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local()
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    def time(tag: String)(f: => Unit): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      f
      println(f"[sigbench] $tag run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time("agg-form")(noop(graft.operators.Dedup.simhashSigs(docs)))
    time("map-side")(noop(docs.select(col("doc_id"),
      graft.operators.Dedup.simhashMapSide(col("text")).as("simhash"))))
    spark.stop()
  }
}
