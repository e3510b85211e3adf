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

  /** Multiplicative-hash bucket in [0, 100) of a numeric id. Taking the id
    * modulo 1,000,003 first keeps the product inside Long (1e6 * 2^31.3 <
    * 2^63) so the arithmetic is exact and portable — the same expression
    * evaluates identically in any SQL engine. */
  def hashBucket(id: Column): Column =
    pmod(pmod(id % 1000003L * 2654435761L, lit(1000000007L)), lit(100L))

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
