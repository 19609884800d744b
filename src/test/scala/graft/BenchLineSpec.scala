package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench summary line IS the driver contract (r15's bench artifact
  * died parsed:null; r16 made the line survivable) — freeze its shape:
  * always valid JSON, always under the driver's ~2000-char stdout-tail
  * capture regardless of query count, slowest-first with the overflow
  * counted in `omitted`, and the mid-pass snapshots marked
  * `"partial":true` so a killed run can never pass an incomplete map
  * off as a full one.
  */
class BenchLineSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def parse(line: String): com.fasterxml.jackson.databind.JsonNode = {
    val n = mapper.readTree(line)
    assert(n != null && n.isObject, s"not a JSON object: $line")
    n
  }

  test("summary line stays valid JSON and under the capture window " +
      "at any query count; overflow lands in omitted, slowest first") {
    val results = (1 to 400).map(i =>
      f"some_rather_long_query_name_$i%03d" -> (i.toDouble / 7))
    val line = Bench.summaryLine(results, "/root/testdata/sf0.1")
    assert(line.length < 1600, s"line ${line.length} chars")
    val n = parse(line)
    assert(n.get("metric").asText == "total")
    assert(n.get("nqueries").asInt == 400)
    assert(n.get("omitted").asInt > 0)
    assert(n.get("partial") == null)
    assert(math.abs(n.get("value").asDouble -
      results.map(_._2).sum) < 0.01)
    // slowest-first: the kept map must contain the slowest query
    assert(n.get("queries").has("some_rather_long_query_name_400"))
    // the whole map fits when small — nothing omitted
    val small = parse(Bench.summaryLine(
      Seq("a" -> 1.0, "b" -> 2.0), "/x"))
    assert(small.get("omitted").asInt == 0)
    assert(small.get("queries").get("b").asDouble == 2.0)
  }

  test("mid-pass snapshots carry partial:true; the startup stamp is a " +
      "zero-query partial") {
    val snap = parse(Bench.summaryLine(Seq("a" -> 1.0), "/x",
      partial = true))
    assert(snap.get("partial").asBoolean)
    val stamp = parse(Bench.summaryLine(Nil, "/x", partial = true))
    assert(stamp.get("partial").asBoolean && stamp.get("nqueries").asInt == 0
      && stamp.get("value").asDouble == 0.0)
  }
}
