package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/**
 * Planted-cluster ground truth for [[Dedup.resolveClusters]] at sf1
 * CARDINALITY (2M documents, 1M edges) — the scale oracle the DuckDB
 * recursive-CTE check cannot provide (its quadratic transitive closure
 * exceeds sandbox disk at sf1; see CORRECTNESS_tuned_r12 sf1 exclusions).
 * Components are planted with closed-form ground truth, so correctness is
 * exact equality, no oracle recursion:
 *
 *   - 500 CHAINS of length 1,000 (diameter 999 — convergence must come
 *     from pointer jumping's O(log d) rounds, not O(d) propagation;
 *     plain min-propagation would need 999 rounds > maxRounds=20),
 *   - 5,000 STARS of 100 (hub + 99 leaves),
 *   - 1,000,000 SINGLETONS (no edges — must come back as their own
 *     cluster via the final left join, never entering the loop).
 *
 * Expected cluster id for every member = min id of its component (the
 * documented label policy).
 */
class ClusterScaleSpec extends SparkSpec {

  test("resolveClusters: 2M ids / 1M planted edges resolve to exact components") {
    val s = spark
    import s.implicits._

    val chainIds = 500L * 1000   // ids [0, 500k): chain c = [c*1000, c*1000+999]
    val starIds = 5000L * 100    // ids [500k, 1M): star t = [base, base+99]
    val total = 2L * 1000 * 1000 // ids [1M, 2M): singletons

    val chainEdges = spark.range(chainIds)
      .filter(col("id") % 1000 =!= 999)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val starEdges = spark.range(chainIds, chainIds + starIds)
      .filter(col("id") % 100 =!= 0)
      .select((col("id") - col("id") % 100).as("id_a"), col("id").as("id_b"))
    val pairs = chainEdges.union(starEdges)

    val docs = spark.range(total).select(col("id").as("doc_id"))
    val got = Dedup.resolveClusters(docs, "doc_id", pairs)

    val expected =
      when(col("doc_id") < chainIds, col("doc_id") - col("doc_id") % 1000)
        .when(col("doc_id") < chainIds + starIds, col("doc_id") - col("doc_id") % 100)
        .otherwise(col("doc_id"))
    val mismatches = got
      .withColumn("_want", expected)
      .filter(col("cluster_id") =!= col("_want"))
    assert(mismatches.count() == 0,
      s"cluster mismatches: ${mismatches.take(5).mkString(", ")}")
    assert(got.count() == total, "every document must get exactly one cluster row")
    // The label-frame plan must stay constant-size across rounds (the
    // checkpoint-truncation guard) even across the ~10 pointer-jump rounds
    // a diameter-999 chain needs.
    assert(Dedup.maxClusterLoopPlanNodes < 200,
      s"cluster-loop plan grew to ${Dedup.maxClusterLoopPlanNodes} nodes")
  }
}
