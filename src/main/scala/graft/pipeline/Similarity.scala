package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over embedding columns (Array[Float]).
 *
 * - Brute-force cosine top-k: one distributed pass, `zip_with` +
 *   `aggregate` (codegen'd higher-order functions, no UDF in the hot path),
 *   then a tiny top-k sort. The correctness baseline.
 * - LSH-bucketed top-k: deterministic random-hyperplane signatures; only
 *   candidates sharing >= `minBandMatches` signature bands are scored — the
 *   100 TB path (shuffle on band keys, never an all-pairs crossJoin).
 */
object Similarity {

  /** Cosine similarity of two array columns as a codegen'd Column. */
  def cosineCol(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(b, lit(0.0d), (acc, x) => acc + x * x))
    dot / (na * nb)
  }

  /** Brute-force cosine top-k against a single query vector. Output:
    * (rank, <idCol>, cosine). */
  def bruteForceTopK(df: DataFrame, embCol: String, idCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val qCol = array(query.map(v => lit(v.toDouble)): _*)
    val scored = df.withColumn("_cos", cosineCol(col(embCol).cast("array<double>"), qCol))
    scored.orderBy(col("_cos").desc, col(idCol))
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("_cos").desc, col(idCol))).cast("long"))
      .select(col("rank"), col(idCol), col("_cos").as("cosine"))
  }

  // Deterministic pseudo-random hyperplanes (seeded xorshift).
  private def hyperplanes(dims: Int, bits: Int, seed: Long): Array[Array[Double]] = {
    var s = seed
    def next(): Double = {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      (s.toDouble / Long.MaxValue)
    }
    Array.fill(bits)(Array.fill(dims)(next()))
  }

  /** Random-hyperplane signature (bits-wide) of an embedding. */
  def signatureUdf(dims: Int, bits: Int, seed: Long = 42L) = {
    val planes = hyperplanes(dims, bits, seed)
    udf((emb: Seq[Float]) => {
      var sig = 0L
      var b = 0
      while (b < bits) {
        var dot = 0.0
        var i = 0
        val p = planes(b)
        val n = math.min(dims, emb.length)
        while (i < n) { dot += p(i) * emb(i); i += 1 }
        if (dot >= 0) sig |= (1L << b)
        b += 1
      }
      sig
    })
  }

  /** LSH-bucketed cosine top-k: score only vectors sharing at least one
    * 4-bit signature band with the query (approximate; recall grows with
    * band count, selectivity with band width). Scales as O(candidates),
    * not O(n): at cluster scale the band match is a semi-join on band keys
    * and only the surviving fraction is exactly scored. */
  def lshTopK(df: DataFrame, embCol: String, idCol: String, query: Seq[Float],
      k: Int, bits: Int = 32, seed: Long = 42L): DataFrame = {
    val dims = query.length
    val sigU = signatureUdf(dims, bits, seed)
    val qSig = {
      // compute the query signature with the same planes, driver-side
      val planes = hyperplanes(dims, bits, seed)
      var sig = 0L
      var b = 0
      while (b < bits) {
        var dot = 0.0
        var i = 0
        while (i < dims) { dot += planes(b)(i) * query(i); i += 1 }
        if (dot >= 0) sig |= (1L << b)
        b += 1
      }
      sig
    }
    val bands = bits / 4
    val qBands = (0 until bands).map(b => ((qSig >>> (b * 4)) & 0xF).toInt)
    val withSig = df.withColumn("_sig", sigU(col(embCol)))
    val candidate = (0 until bands).map { b =>
      (shiftrightunsigned(col("_sig"), b * 4).bitwiseAND(lit(0xFL)) === lit(qBands(b).toLong))
    }.reduce(_ || _)
    bruteForceTopK(withSig.filter(candidate), embCol, idCol, query, k)
  }
}
