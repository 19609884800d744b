package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session: ScalaTest
  * runs suites sequentially in the forked JVM).
  */
trait SparkSpecBase extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSpecBase.session
  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // keep the session for the next suite; SBT tears the JVM down at the end
    super.afterAll()
  }
}

object SparkSpecBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Spark 4.1's checksummed checkpoint file manager serializes every
      // state-store write behind an async-await; on local tmpfs it
      // dominates micro-batch latency. Plain checkpoints are fine here.
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      // fresh per-JVM warehouse: the in-memory catalog forgets tables
      // across JVMs but their directories would survive and collide
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
