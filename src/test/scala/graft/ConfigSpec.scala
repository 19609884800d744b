package graft

import graft.pipeline.ConfigUtils
import org.scalatest.funsuite.AnyFunSuite

/** ConfigUtils parity with the reference's util/ConfigUtils.java:
  * arg parsing, properties-file merge with CLI precedence, and the
  * kafka-prefixed pass-through in both client and Spark option shapes.
  */
class ConfigSpec extends AnyFunSuite {

  test("--key value and --key=value forms parse; flags default to true") {
    val conf = ConfigUtils.loadConfiguration(Array(
      "--kafka.max.poll.records", "250", "--mode=batch", "--verbose"))
    assert(conf("kafka.max.poll.records") == "250")
    assert(conf("mode") == "batch")
    assert(conf("verbose") == "true")
  }

  test("config-file merges under CLI precedence (reference mergeWith order)") {
    val f = java.io.File.createTempFile("graft-conf", ".properties")
    f.deleteOnExit()
    val w = new java.io.FileWriter(f)
    w.write("kafka.acks=all\nmode=file\n")
    w.close()
    val conf = ConfigUtils.loadConfiguration(Array(
      "--config-file", f.getAbsolutePath, "--mode", "cli"))
    assert(conf("kafka.acks") == "all") // file-only key survives
    assert(conf("mode") == "cli")       // CLI wins on conflict
  }

  test("kafka-prefixed pass-through: stripped client shape and prefixed Spark shape") {
    val conf = Map("kafka.acks" -> "all", "kafka.max.poll.records" -> "250",
      "mode" -> "batch")
    assert(ConfigUtils.kafkaProperties(conf) ==
      Map("acks" -> "all", "max.poll.records" -> "250"))
    assert(ConfigUtils.sparkKafkaOptions(conf) ==
      Map("kafka.acks" -> "all", "kafka.max.poll.records" -> "250"))
  }
}
