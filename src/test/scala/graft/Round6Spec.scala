package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Round-6 additions: the LSH-pruned embedding near-dup (the 100 TB
  * path for dedup_embedding's semantics) and the self-checking gate
  * forms of the approximate operators.
  */
class Round6Spec extends SparkSpecBase {

  test("embedding near-dup LSH: subset of the exact form with identical scores") {
    val exact = Similarity.embeddingNearDup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.embeddingNearDupLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every LSH pair is an exact pair, score bit-identical (same kernel)
    lsh.foreach { case (pair, score) =>
      assert(exact.contains(pair), s"LSH invented pair $pair")
      assert(exact(pair) == score, s"score drift on $pair")
    }
    // recall ≥ 80% on this corpus at the default banding parameters
    assert(exact.nonEmpty)
    assert(lsh.size * 5 >= exact.size * 4,
      s"recall ${lsh.size}/${exact.size} below the 80% contract")
  }

  test("checked gate forms emit all-green contract verdicts at spec scale") {
    // each (queryKey, verdict columns) — the oracle pins these to 1 at
    // sf0.01; this asserts the same contracts hold at sf0.001 so a
    // driver failure would reproduce locally at the cheap tier first
    val cases = Seq(
      "q12_approx_distinct" -> Seq("within_5pct"),
      "q12b_approx_percentile" -> Seq("p50_rank_ok", "p90_rank_ok"),
      "sketch_rollup" -> Seq("within_2pct"),
      "sketch_sliding_users" -> Seq("within_2pct"),
      "sketch_quantile_rollup" -> Seq("p50_rank_ok", "p95_rank_ok"),
      "dedup_embedding_lsh" -> Seq("subset_ok", "recall_ge_80"))
    cases.foreach { case (key, cols) =>
      val df = SparkEntry.queries(key)(spark, sfDir)
      val n = df.count()
      assert(n > 0, s"$key returned no rows")
      cols.foreach { c =>
        val bad = df.filter(col(c) =!= 1L).count()
        assert(bad == 0, s"$key: $bad rows violate $c")
      }
    }
  }

  test("ANN checked gates satisfy their contracts at spec scale") {
    // universal invariants (k results, true scores, bounded by the
    // global best) hold at ANY scale; the per-family recall addenda
    // (top1_found, recall_ge_3) are measured-deterministic contracts of
    // the sf0.01 gate corpus and are asserted there below
    val byKey = Map(
      "q26_ann_lsh" -> Similarity.annLshChecked(spark, sfDir),
      "q26_ann_ivf" -> Similarity.annIvfChecked(spark, sfDir),
      "q26_ann_pq" -> Similarity.annPqChecked(spark, sfDir))
    byKey.foreach { case (key, df) =>
      val row = df.collect().head
      assert(row.getAs[Long]("ann_k") == 5L, s"$key ann_k")
      assert(row.getAs[Long]("scores_exact") == 5L, s"$key scores_exact")
      assert(row.getAs[Long]("bounded") == 5L, s"$key bounded")
    }
  }

  test("ANN recall addenda hold on the sf0.01 gate corpus") {
    val gateDir = "/root/testdata/sf0.01"
    val ivf = Similarity.annIvfChecked(spark, gateDir).collect().head
    assert(ivf.getAs[Long]("top1_found") == 1L)
    val pq = Similarity.annPqChecked(spark, gateDir).collect().head
    assert(pq.getAs[Long]("top1_found") == 1L)
    assert(pq.getAs[Long]("recall_ge_3") == 1L)
  }
}
