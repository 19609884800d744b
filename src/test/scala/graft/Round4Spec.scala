package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import graft.functions.{HyperplaneBucket, ZOrderFunction}

/** Round-4 fixes: percentile NULL-key groups and unhinted stats join,
  * zorder2 analysis-time typing, shared LSH sign-bit helper.
  */
class Round4Spec extends SparkSpecBase {
  import spark.implicits._

  test("percentiles: NULL group key survives and matches the aggregate form") {
    val df = (Seq.tabulate(50)(i => (Some("a"), i.toDouble)) ++
      Seq.tabulate(50)(i => (Option.empty[String], i * 2.0)))
      .toDF("k", "v")
    val out = graft.operators.Percentiles.grouped(df, "k", "v", Seq(0.5))
      .collect().map(r => (Option(r.getString(0)), r.getDouble(1))).toMap
    val ref = df.groupBy($"k")
      .agg(expr("percentile(v, 0.5)").as("p50"))
      .collect().map(r => (Option(r.getString(0)), r.getDouble(1))).toMap
    assert(out.keySet == Set(Some("a"), None)) // NULL-key group present
    assert(out == ref)
  }

  test("percentiles: stats subtree plans as ONE reused exchange, no broadcast hint") {
    val df = Tables.t(spark, sfDir, "lineitem")
      .select($"l_returnflag".as("k"), $"l_quantity".cast("double").as("v"))
    val q = graft.operators.Percentiles.grouped(df, "k", "v", Seq(0.5, 0.9))
    // no forced broadcast anywhere: at high key cardinality a hinted
    // broadcast of the per-group stats frame would OOM the driver
    assert(!q.queryExecution.analyzed.toString.contains("Hint"),
      "percentile plan must not force a broadcast hint")
    q.collect() // settle AQE
    // pass 1 (count + sketch) must run once; the other instantiations of
    // the stats subtree must come back as ReusedExchange at runtime
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"expected stats exchange reuse in final adaptive plan:\n$plan")
  }

  test("zorder2: non-BIGINT input fails at analysis time, not runtime") {
    ZOrderFunction.register(spark)
    val df = Seq((1, 2)).toDF("x", "y") // INT columns
    val e = intercept[AnalysisException] {
      df.select(ZOrderFunction.zorder2(col("x"), col("y"))).collect()
    }
    assert(e.getMessage.contains("BIGINT"))
    // and the happy path still works
    val ok = Seq((3L, 5L)).toDF("x", "y")
      .select(ZOrderFunction.zorder2(col("x"), col("y"))).head.getLong(0)
    // interleave(x=0b11, y=0b101): x bits -> even positions (0b101 = 5),
    // y bits -> odd positions (0b100010 = 34); 5 | 34 = 39
    assert(ok == 39L)
  }

  test("hyperplane bucket: shared helper equals the expression over the corpus") {
    graft.functions.VectorFunctions.register(spark)
    val planes = Array(
      Array(1.0, -0.5, 0.25, 0.0), Array(-1.0, 0.0, 2.0, -0.125),
      Array(0.5, 0.5, -0.5, 0.5))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hb_test", exprs => graft.functions.HyperplaneBucket(exprs.head, planes),
      "built-in")
    val vecs = Seq(
      Array(0.9f, 0.1f, -0.3f, 2.0f), Array(-1.0f, -1.0f, -1.0f, -1.0f),
      Array(0.0f, 0.0f, 0.0f, 0.0f), // zero vector: every dot==0 -> all sign bits set
      Array(2.5f, -0.5f)) // shorter than the planes: min-length truncation
    val viaExpr = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "emb")
      .selectExpr("id", "hb_test(emb) AS b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.zipWithIndex.foreach { case (v, i) =>
      assert(viaExpr(i.toLong) == HyperplaneBucket.bucketOf(v, planes),
        s"probe-side helper diverged from expression for vector $i")
    }
  }
}
