package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspection main (dev tool, not part of the engine). */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val q = graft.operators.Dedup.bloomSnapshotDedup(spark, dir)
    q.collect()
    println(q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head)
    spark.stop()
  }
}
