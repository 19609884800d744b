package graft

import graft.queries.Relational
import graft.operators.{AsOfJoin, Similarity}

/** Physical-plan hygiene locked into the suite (the PLANS.md audit as
  * executable assertions): pushdown, pruning, broadcast, top-k, and
  * shuffle-count regressions fail here, not at 100 TB.
  */
class PlanSpec extends SparkSpecBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE finalizes the adaptive plan
    df.queryExecution.executedPlan.toString
  }
  private def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("q02: predicates reach the parquet scan; schema pruned") {
    val f = formatted(Relational.q02FilterProject(spark, sfDir))
    assert(f.contains("PushedFilters:") && f.contains("GreaterThan(o_totalprice,1000.0)"))
    assert(f.contains("ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string,o_totalprice:double>"))
  }

  test("q05: explicit broadcast produces a BroadcastExchange") {
    assert(plan(Relational.q05JoinBroadcast(spark, sfDir))
      .contains("BroadcastExchange"))
  }

  test("q16: top-k compiles to TakeOrderedAndProject, not a global sort") {
    assert(plan(Relational.q16TopK(spark, sfDir))
      .contains("TakeOrderedAndProject"))
  }

  test("asof join: exactly one hash exchange (the timeline window)") {
    val f = formatted(AsOfJoin.clickToSignup(spark, sfDir))
    val hashExchanges = "Arguments: hashpartitioning".r.findAllIn(f).length
    assert(hashExchanges == 1, s"expected 1 hash exchange, got $hashExchanges")
  }

  test("join strategy hints are honored (shuffle_hash / merge)") {
    val o = graft.Tables.t(spark, sfDir, "orders")
    val c = graft.Tables.t(spark, sfDir, "customer")
    val sh = plan(o.hint("shuffle_hash").join(c, o("o_custkey") === c("c_custkey")))
    assert(sh.contains("ShuffledHashJoin"), "shuffle_hash hint ignored")
    val m = plan(o.hint("merge").join(c, o("o_custkey") === c("c_custkey")))
    assert(m.contains("SortMergeJoin"), "merge hint ignored")
  }

  test("range join: bucketed plan has no nested-loop operator") {
    val f = plan(operators.RangeJoin.q09bRangeJoin(spark, sfDir))
    assert(!f.contains("BroadcastNestedLoopJoin") && !f.contains("CartesianProduct"),
      "banded range join must plan as an equi-join on the bucket key")
  }

  test("embedding near-dup: block-grid plan has no nested-loop operator") {
    val f = plan(operators.Similarity.embeddingNearDup(spark, sfDir))
    assert(!f.contains("BroadcastNestedLoopJoin") && !f.contains("CartesianProduct"),
      "all-pairs similarity must plan as an equi-join on the block key")
  }

  test("q26: cosine kernel is the native expression inside the projection") {
    val f = formatted(Similarity.q26CosineTopK(spark, sfDir))
    assert(f.contains("cosine_sim"))
    assert(!f.toLowerCase.contains("batchevalpython") && !f.contains("ScalaUDF"))
  }
}
