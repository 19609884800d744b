package graft.pipeline

/** Configuration loading mirroring the reference's
  * `util/ConfigUtils.java` (reference: ConfigUtils.java:19-37 arg+file
  * merge, :46-60 kafka-prefixed property pass-through), re-expressed for
  * Spark's option model.
  *
  * The reference filters `kafka.`-prefixed app properties and STRIPS the
  * prefix to build raw client `Properties`. Spark's Kafka source/sink
  * inverts that convention: pass-through client properties are supplied
  * to the reader/writer AS `kafka.`-prefixed options (`option("kafka.
  * max.poll.records", …)`). Both shapes are provided so a user can feed
  * either a raw client or a Spark reader from one config map.
  */
object ConfigUtils {

  /** Parse `--key value` / `--key=value` command-line pairs, then merge
    * a `--config-file <properties>` if present — command line takes
    * precedence, like the reference's `mergeWith` order
    * (ConfigUtils.java:30).
    */
  def loadConfiguration(args: Array[String]): Map[String, String] =
    parseArgs(args)._1

  /** Like [[loadConfiguration]], but also returns the positional
    * arguments — the tokens NOT consumed as an option key or the value
    * of a space-separated `--key value` pair. Deriving positionals from
    * the unconsumed indices (rather than `filterNot(_.startsWith("--"))`)
    * keeps option values like `--config-file app.properties` out of the
    * positional list regardless of argument order.
    */
  def parseArgs(args: Array[String]): (Map[String, String], Seq[String]) = {
    val cli = scala.collection.mutable.LinkedHashMap[String, String]()
    val positional = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("--")) {
        val body = a.drop(2)
        val eq = body.indexOf('=')
        if (eq >= 0) { cli += body.take(eq) -> body.drop(eq + 1); i += 1 }
        else if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
          cli += body -> args(i + 1); i += 2
        } else { cli += body -> "true"; i += 1 }
      } else { positional += a; i += 1 }
    }
    val fromFile: Map[String, String] = cli.get("config-file") match {
      case Some(path) =>
        val p = new java.util.Properties()
        val in = new java.io.FileInputStream(path)
        try p.load(in) finally in.close()
        import scala.jdk.CollectionConverters._
        p.stringPropertyNames().asScala.map(k => k -> p.getProperty(k)).toMap
      case None => Map.empty
    }
    (fromFile ++ cli, positional.toSeq) // CLI wins on conflict
  }

  /** The reference's shape: keys with `prefix`, prefix STRIPPED — raw
    * Kafka client `Properties` material (ConfigUtils.java:52-58).
    */
  def kafkaProperties(conf: Map[String, String],
      prefix: String = "kafka."): Map[String, String] =
    conf.collect { case (k, v) if k.startsWith(prefix) =>
      k.substring(prefix.length) -> v
    }

  /** Spark's shape: the same filtered keys kept `kafka.`-prefixed, ready
    * for `DataStreamReader.options(...)` — Spark's source/sink forwards
    * any `kafka.`-prefixed option to the underlying client.
    */
  def sparkKafkaOptions(conf: Map[String, String],
      prefix: String = "kafka."): Map[String, String] =
    conf.filter { case (k, _) => k.startsWith(prefix) }
}
