package graft

import org.apache.spark.sql.functions._

/** Round-9 additions: the bloom-prefiltered decontamination twin and the
  * BloomBridge expression surface it rides on.
  */
class Round9Spec extends SparkSpecBase {

  test("bloom sketch has no false negatives and a bounded false-positive tail") {
    graft.functions.BloomBridge.register(spark)
    import spark.implicits._
    import graft.functions.BloomBridge
    val members = (0L until 2000L).map(i => s"member_$i").toDF("v")
    val sketch = members.agg(
      BloomBridge.bloomAgg(BloomBridge.h(col("v")), 4096L, 1L << 16).as("bf"))
    // every inserted value must probe true — bloom's defining contract
    val misses = members
      .filter(!BloomBridge.mightContain(sketch, BloomBridge.h(col("v"))))
      .count()
    assert(misses == 0, s"$misses false negatives")
    // non-members: the fpp tail must be small (2^16 bits / 4096 items
    // ⇒ ~16 bits/item, fpp well under 1%; assert a loose 5% ceiling so
    // the test pins behavior, not a constant)
    val others = (0L until 2000L).map(i => s"other_$i").toDF("v")
    val fp = others
      .filter(BloomBridge.mightContain(sketch, BloomBridge.h(col("v"))))
      .count()
    assert(fp <= 100, s"$fp false positives out of 2000")
  }

  test("bloom-prefiltered decontam is row-identical to the exact operator") {
    val exact = operators.TextAnalysis.decontamNgram(spark, sfDir)
    val bloom = operators.TextAnalysis.decontamBloom(spark, sfDir)
    assert(bloom.schema == exact.schema)
    assert(bloom.exceptAll(exact).isEmpty && exact.exceptAll(bloom).isEmpty)
    assert(bloom.count() == exact.count() && exact.count() > 0)
  }

  test("bloom prefilter runs map-side: no join for the sketch probe") {
    val bloom = operators.TextAnalysis.decontamBloom(spark, sfDir)
    bloom.collect()
    val plan = bloom.queryExecution.executedPlan.toString
    // the probe appears as a Filter over a subquery, never a join key
    assert(plan.contains("might_contain"), "bloom probe missing from plan")
    val filterLines = plan.linesIterator.filter(_.contains("might_contain")).toSeq
    assert(filterLines.exists(_.contains("Filter")),
      s"might_contain not in a Filter:\n${filterLines.mkString("\n")}")
  }
}
