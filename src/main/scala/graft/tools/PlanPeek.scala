package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspection main (dev tool, not part of the engine). */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    import org.apache.spark.sql.functions._
    val df = graft.Tables.t(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
        "/root/testdata/sf0.001"), "lineitem")
      .select(col("l_returnflag").as("k"), col("l_quantity").cast("double").as("v"))
    val q = graft.operators.Percentiles.grouped(df, "k", "v", Seq(0.5, 0.9))
    q.collect() // materialize so AQE settles on the final plan
    println("=== final adaptive plan ===")
    val p = q.queryExecution.executedPlan.toString
    println(p)
    println("approx_percentile occurrences: " +
      "approx_percentile".r.findAllIn(p).size)
    println("ReusedExchange occurrences: " +
      "ReusedExchange".r.findAllIn(p).size)
    q.show(5)
    spark.stop()
  }
}
