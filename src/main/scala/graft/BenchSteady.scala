package graft

/** Steady-state bench sidecar: median-of-3 timings for the costliest
  * queries, appended per round to BENCH_STEADY.json so round-over-round
  * deltas are attributable to code, not to the host's 2-5× CPU-burst
  * throttling (the suite bench is min-of-2 inside one long run, which
  * absorbs only one throttled pass; medians of short dedicated runs are
  * the steadier estimator).
  *
  * Usage: runMain graft.BenchSteady [queryName...] — with no args the
  * query set is the top-20 by cost from the latest BENCH_FULL.json.
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_ROUND (label).
  */
object BenchSteady {

  private val TopN = 20

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val label = sys.env.getOrElse("SPARK_GRAFT_ROUND", "r?")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else topFromBenchFull().getOrElse {
        System.err.println("[steady] no BENCH_FULL.json; pass query names")
        return
      }
    val spark = GraftSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(n => Tables.t(spark, sfDir, n).count())
    Bench.warmup(spark, sfDir)
    val runs = names.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          dt
        }
        name -> ts
      }
    }
    val medians = runs.map { case (n, ts) => n -> ts.sorted.apply(1) }
    def num(d: Double) = f"$d%.3f"
    val obj =
      s"""{"label":"$label","sf":"$sfDir",""" +
      s""""medians":${medians.map { case (k, v) => "\"" + k + "\":" + num(v) }
        .mkString("{", ",", "}")},""" +
      s""""runs":${runs.map { case (k, ts) =>
        "\"" + k + "\":[" + ts.map(num).mkString(",") + "]" }
        .mkString("{", ",", "}")}}"""
    val path = java.nio.file.Paths.get("BENCH_STEADY.json")
    val out =
      if (java.nio.file.Files.exists(path)) {
        val prev = new String(java.nio.file.Files.readAllBytes(path), "UTF-8").trim
        if (prev.startsWith("[") && prev.endsWith("]"))
          prev.dropRight(1) + ",\n" + obj + "]"
        else "[" + obj + "]"
      } else "[" + obj + "]"
    java.nio.file.Files.write(path, out.getBytes("UTF-8"))
    println(s"[steady] wrote ${medians.length} medians to BENCH_STEADY.json label=$label")
    spark.stop()
  }

  /** Top-N costliest queries from BENCH_FULL.json's min-of-2 map (flat
    * regex parse — the file is self-authored, no JSON lib on the main
    * classpath needed).
    */
  private def topFromBenchFull(): Option[Seq[String]] = {
    val p = java.nio.file.Paths.get("BENCH_FULL.json")
    if (!java.nio.file.Files.exists(p)) return None
    val s = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val start = s.indexOf("\"queries\":{")
    if (start < 0) return None
    val body = s.substring(start + 11, s.indexOf('}', start))
    val pair = """"([^"]+)":([0-9.Ee+-]+)""".r
    val entries = pair.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toDouble).toSeq
    if (entries.isEmpty) None
    else Some(entries.sortBy(-_._2).take(TopN).map(_._1))
  }
}
