package graft

import graft.pipeline.Dedup

/**
 * [[Dedup.simhashNearDuplicates]] exactness for maxHamming <= 3, INCLUDING
 * over-cap band buckets: the two-level sub-band refinement must find every
 * brute-force pair that the r11 drop-the-bucket cap silently lost (caught
 * as a 3% pair deficit on the sf1 corpus).
 */
class SimhashRefineSpec extends SparkSpec {

  import spark.implicits._

  // Three families of 20 texts each; within a family texts differ by a few
  // trailing tokens, so signatures cluster densely (band buckets >> cap)
  // with a realistic spread of Hamming distances.
  private def corpus: Seq[(Long, String)] = {
    val bases = Seq(
      "the quick brown fox jumps over the lazy dog near the riverbank today",
      "global parquet manifests carry column statistics for pruning and planning engines",
      "streaming ingestion pipelines deduplicate documents before tokenization and packing stages")
    for {
      (base, g) <- bases.zipWithIndex
      i <- 0 until 20
    } yield ((g * 100 + i).toLong,
      base + " " + Seq("alpha", "beta", "gamma", "delta")(i % 4) + (if (i % 5 == 0) " extra" else ""))
  }

  private def bruteForce(docs: Seq[(Long, String)], maxHamming: Int): Set[(Long, Long)] = {
    val sigs = docs.map { case (id, t) => id -> Dedup.simhash(t) }
    (for {
      (a, sa) <- sigs; (b, sb) <- sigs
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= maxHamming
    } yield (a, b)).toSet
  }

  test("over-cap buckets refine through sub-bands instead of dropping pairs") {
    val docs = corpus
    val want = bruteForce(docs, maxHamming = 3)
    assert(want.nonEmpty, "test corpus produced no near-dup pairs")
    val df = docs.toDF("doc_id", "text")
    // cap 8 << family size 20: every family's band buckets overflow, so
    // every wanted pair must come through the refinement path.
    val got = Dedup.simhashNearDuplicates(df, "text", "doc_id", maxHamming = 3, maxBucket = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == want,
      s"refined pairs differ from brute force: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    // And the all-small-bucket path agrees with the same ground truth.
    val gotBig = Dedup.simhashNearDuplicates(df, "text", "doc_id", maxHamming = 3, maxBucket = 1000000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(gotBig == want)
  }
}
