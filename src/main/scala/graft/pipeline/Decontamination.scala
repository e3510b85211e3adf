package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination: flag training documents whose word n-gram
 * shingles overlap an evaluation set — the standard guard against test-set
 * leakage when assembling LLM training data.
 *
 * Scale shape (100 TB corpus, megabyte-scale eval sets): the EVAL side's
 * distinct shingle hashes are collected into a broadcast (eval sets are
 * benchmarks — thousands to millions of shingles, never corpus-sized);
 * the corpus side is one projection exploding each document's distinct
 * shingle hashes, a broadcast semi-probe, and a per-document count
 * aggregation. One corpus-wide shuffle total (the groupBy on doc id, which
 * combines map-side), zero corpus-vs-corpus joins. Shingles are 64-bit
 * hashes ([[Dedup.ngramHashes]]) — set semantics identical to string
 * shingles short of ~1e-13-per-doc collisions, at 8 bytes each.
 */
object Decontamination {

  /** Per-document contamination report: (id, n_shingles, n_matched,
    * contamination in [0,1], contaminated at `threshold`). Documents with
    * no words at all produce no shingles and are absent from the report
    * (nothing to leak). */
  def contamination(corpus: DataFrame, textCol: String, idCol: String,
      evalSet: DataFrame, evalTextCol: String,
      n: Int = 8, threshold: Double = 0.5): DataFrame = {
    // Unlike the dedup shingler (where an empty doc still needs an identity
    // for exact-duplicate grouping), a wordless document must contribute
    // ZERO shingles — the sentinel hash of "" would otherwise mark every
    // empty doc as contaminated whenever the eval set contains one.
    // Tokenize ONCE per document: the wordless-doc check and the shingle
    // hashing share the same split (a second corpus-wide tokenization pass
    // is real money at 100 TB).
    val shingles = udf((t: String) => {
      val text = if (t == null) "" else t
      val words = text.toLowerCase.split("\\W+").filter(_.nonEmpty)
      if (words.isEmpty) Array.empty[Long]
      else Dedup.ngramHashesFromWords(words, n)
    })
    val evalShingles = evalSet
      .select(explode(shingles(col(evalTextCol))).as("_sh")).distinct()
    val docShingles = corpus
      .select(col(idCol).cast("long").as(idCol), explode(shingles(col(textCol))).as("_sh"))
      .distinct()
    docShingles
      .join(broadcast(evalShingles.withColumn("_hit", lit(1))), Seq("_sh"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).cast("long").as("n_shingles"),
        sum(coalesce(col("_hit"), lit(0))).cast("long").as("n_matched"))
      .withColumn("contamination",
        col("n_matched").cast("double") / col("n_shingles"))
      .withColumn("contaminated", col("contamination") >= threshold)
  }
}
