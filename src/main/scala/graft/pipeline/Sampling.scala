package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Dataset assembly for training pipelines: deterministic splits and
 * token-budget sequence packing.
 *
 * Both are pure built-in expression pipelines (no UDF, no RNG state):
 * rerunning on the same corpus reproduces the same assignment bit-for-bit
 * on any engine — the property a 100 TB training set needs so that a
 * re-shard or a backfill doesn't silently move documents between train
 * and validation.
 */
object Sampling {

  /** Version of the deterministic hash-split/resample functions. Bump this
    * whenever [[hashBucket]]/[[hashBucket10k]] change formula: bucket
    * assignment is a CONTRACT with incremental pipelines (a doc that was
    * 'train' under one version landing in 'test' under the next is
    * cross-version leakage). History:
    *   1 — single-modulus multiplicative hash (rounds ≤ 9).
    *   2 — dual-modulus sum (round 10): every id's bucket changed; corpora
    *       split incrementally under v1 must be fully re-split, not
    *       extended, under v2. */
  val SplitFunctionVersion: Int = 2

  /** Multiplicative-hash bucket in [0, 100) of a numeric id. Each term
    * reduces the id by a ~1e6 prime first so the product stays inside Long
    * (1e6 * 2^31.3 < 2^63) — the arithmetic is exact and portable, the
    * same expression evaluates identically in any SQL engine. TWO coprime
    * moduli are summed so ids can only co-move between buckets when their
    * difference is a multiple of lcm(1000003, 1000033) ~ 1e12 — a single
    * modulus would make every id pair at stride exactly 1,000,003 land in
    * the same bucket, correlating synthetically re-keyed corpora whose
    * stride structure hits that residue class. */
  def hashBucket(id: Column): Column =
    pmod(pmod(id % 1000003L * 2654435761L, lit(1000000007L)) +
         pmod(id % 1000033L * 2246822519L, lit(1000000007L)), lit(100L))

  /** Deterministic train/val/test split: `valPct`% of hash buckets go to
    * 'val', `testPct`% to 'test', the rest to 'train'. A narrow projection
    * + no shuffle — at 100 TB this is a free column, not a job. */
  def deterministicSplit(df: DataFrame, idCol: String,
      valPct: Int = 5, testPct: Int = 5): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100,
      s"split percentages out of range: val=$valPct test=$testPct")
    val b = hashBucket(col(idCol))
    df.withColumn("split",
      when(b < valPct, lit("val"))
        .when(b < valPct + testPct, lit("test"))
        .otherwise(lit("train")))
  }

  /** Finer-grained hash bucket in [0, 10000) for sub-percent sampling
    * rates; same exact-Long dual-modulus construction as [[hashBucket]],
    * over a DISJOINT modulus/prime chain so resampling decisions are
    * independent of split decisions. */
  def hashBucket10k(id: Column): Column =
    pmod(pmod(id % 999983L * 2654435761L, lit(999999937L)) +
         pmod(id % 999979L * 2246822519L, lit(999999937L)), lit(10000L))

  /** Deterministic domain-mix resampling: keep each row of domain `d` with
    * probability `rates(d)` (missing domains keep `defaultRate`), decided
    * by the id's hash bucket — reproducible on any engine, no RNG, and
    * independent of the split buckets (different modulus chain). The
    * standard down-weighting step when assembling a training mixture
    * (e.g. cap a dominant language at 25%). A narrow projection + filter:
    * no shuffle at any corpus size. */
  def resampleByRates(df: DataFrame, domainCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      s"rates must be in [0,1]: $rates default=$defaultRate")
    val cut = rates.foldLeft(lit((defaultRate * 10000).toInt)) { case (acc, (k, r)) =>
      when(col(domainCol) === k, lit((r * 10000).toInt)).otherwise(acc)
    }
    df.filter(hashBucket10k(col(idCol)) < cut)
  }

  /** Greedy sequence packing: within each of `shards` hash-shards, order
    * documents by id and cut bins of (cumulative token count - 1) /
    * `tokenBudget` — consecutive documents share a bin until the budget is
    * crossed; every bin except possibly a shard's last holds >= 1 document
    * and the bin id is reproducible.
    *
    * Scale shape: the window partitions BY SHARD (one hash shuffle), so no
    * single task ever sorts the whole corpus — packing 100 TB is `shards`
    * independent cumulative sums, not one global order-by. */
  def packByTokenBudget(df: DataFrame, idCol: String, tokenCol: String,
      tokenBudget: Long, shards: Int = 64): DataFrame = {
    require(tokenBudget > 0 && shards > 0)
    val shard = pmod(col(idCol), lit(shards.toLong)).as("pack_shard")
    val w = Window.partitionBy("pack_shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("pack_shard", shard)
      .withColumn("pack_bin",
        floor((sum(col(tokenCol)).over(w) - 1) / tokenBudget).cast("long"))
  }
}
