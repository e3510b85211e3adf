package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for large-scale document pipelines.
 *
 * Scale design (100 TB): every variant is bucketed — candidate pairs come
 * from shuffle-on-key joins (band hashes / simhash bands), NEVER an
 * all-pairs crossJoin. Cost is O(n * bands) shuffle rows; bucket skew is
 * capped (oversized buckets dropped with a count, documented below).
 */
object Dedup {

  /** Deterministic 64-bit string hash (FNV-1a), stable across JVMs/runs. */
  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Exact dedup: keep one row per exact value of `keyCols` (lowest id).
    * Pure hash-aggregation — one shuffle on the key. */
  def exact(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Exact-dup groups: per duplicate key, the keeper id + copy count. */
  def exactGroups(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).cast("long").as("keeper_id"), count(lit(1)).cast("long").as("copies"))
      .select("keeper_id", "copies")

  // ---------- MinHash + LSH ----------

  private val MinhashPerms = 64
  private val Bands = 16
  private val RowsPerBand = MinhashPerms / Bands
  // Deterministic permutation parameters (odd multipliers).
  private val permA: Array[Long] = Array.tabulate(MinhashPerms)(i => 0x9E3779B97F4A7C15L * (2 * i + 1) | 1L)
  private val permB: Array[Long] = Array.tabulate(MinhashPerms)(i => 0xC2B2AE3D27D4EB4FL * (i + 1))

  /** MinHash signature of a document: word-shingle set -> 64 min-hashes. */
  def minhashSignature(text: String, shingleSize: Int): Array[Long] = {
    val words = text.toLowerCase.split("\\W+").filter(_.nonEmpty)
    val sig = Array.fill(MinhashPerms)(Long.MaxValue)
    if (words.length >= shingleSize) {
      var i = 0
      while (i <= words.length - shingleSize) {
        val shingle = words.slice(i, i + shingleSize).mkString(" ")
        val h = fnv64(shingle)
        var p = 0
        while (p < MinhashPerms) {
          val v = permA(p) * h + permB(p)
          if (v < sig(p)) sig(p) = v
          p += 1
        }
        i += 1
      }
    }
    sig
  }

  /** Near-duplicate candidate pairs via MinHash-LSH banding.
    * Returns (id_a, id_b, est_jaccard) with id_a < id_b and
    * est_jaccard >= threshold. `maxBucket` caps pathological buckets
    * (identical boilerplate at web scale) — dropped buckets trade recall
    * for a hard O(maxBucket^2) per-bucket bound. */
  def minhashNearDuplicates(
      df: DataFrame,
      textCol: String,
      idCol: String,
      threshold: Double = 0.8,
      shingleSize: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    val spark = df.sparkSession
    val sigUdf = udf((t: String) => minhashSignature(if (t == null) "" else t, shingleSize))
    val withSig = df.select(col(idCol).cast("long").as("_id"), col(textCol).as("_text"))
      .withColumn("_sig", sigUdf(col("_text")))
      .select("_id", "_sig")

    // Band hashes: band index + hash of the band's signature slice.
    val bandUdf = udf((sig: Seq[Long]) =>
      (0 until Bands).map(b => (b, sig.slice(b * RowsPerBand, (b + 1) * RowsPerBand).mkString(":").hashCode.toLong)))
    val banded = withSig
      .withColumn("_band", explode(bandUdf(col("_sig"))))
      .select(col("_id"), col("_sig"), col("_band._1").as("_b"), col("_band._2").as("_h"))

    // Bucket join: pairs only within (band, hash) buckets; cap bucket size.
    val buckets = banded.groupBy("_b", "_h")
      .agg(collect_list(struct(col("_id"), col("_sig"))).as("_members"))
      .filter(size(col("_members")).between(2, maxBucket))

    val pairUdf = udf((members: Seq[org.apache.spark.sql.Row]) => {
      val ms = members.map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
      val out = Seq.newBuilder[(Long, Long, Double)]
      var i = 0
      while (i < ms.length) {
        var j = i + 1
        while (j < ms.length) {
          val (ia, sa) = ms(i); val (ib, sb) = ms(j)
          var eq = 0; var p = 0
          while (p < MinhashPerms) { if (sa(p) == sb(p)) eq += 1; p += 1 }
          val est = eq.toDouble / MinhashPerms
          out += ((ia, ib, est))
          j += 1
        }
        i += 1
      }
      out.result()
    })
    buckets.select(explode(pairUdf(col("_members"))).as("_p"))
      .select(col("_p._1").as("id_a"), col("_p._2").as("id_b"), col("_p._3").as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash over word hashes. */
  def simhash(text: String): Long = {
    val words = text.toLowerCase.split("\\W+").filter(_.nonEmpty)
    val acc = new Array[Int](64)
    words.foreach { w =>
      val h = fnv64(w)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** SimHash near-dup candidates: 4 bands of 16 bits; pairs whose full
    * hashes are within `maxHamming`. Bucketed exactly like MinHash-LSH. */
  def simhashNearDuplicates(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val shUdf = udf((t: String) => simhash(if (t == null) "" else t))
    val withH = df.select(col(idCol).cast("long").as("_id"), shUdf(col(textCol)).as("_sh"))
    val banded = withH.withColumn("_b", explode(array((0 until 4).map(lit): _*)))
      .withColumn("_h", expr("shiftrightunsigned(_sh, _b * 16)").bitwiseAND(lit(0xFFFFL)))
    val buckets = banded.groupBy("_b", "_h")
      .agg(collect_list(struct(col("_id"), col("_sh"))).as("_members"))
      .filter(size(col("_members")).between(2, maxBucket))
    val pairUdf = udf((members: Seq[org.apache.spark.sql.Row]) => {
      val ms = members.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val out = Seq.newBuilder[(Long, Long, Int)]
      var i = 0
      while (i < ms.length) {
        var j = i + 1
        while (j < ms.length) {
          val d = java.lang.Long.bitCount(ms(i)._2 ^ ms(j)._2)
          out += ((ms(i)._1, ms(j)._1, d))
          j += 1
        }
        i += 1
      }
      out.result()
    })
    buckets.select(explode(pairUdf(col("_members"))).as("_p"))
      .select(col("_p._1").as("id_a"), col("_p._2").as("id_b"), col("_p._3").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** N-gram Jaccard similarity for a verified pair (exact, not estimated) —
    * used to re-score LSH candidates. */
  def ngramJaccard(a: String, b: String, n: Int = 3): Double = {
    def grams(s: String): Set[String] = {
      val w = s.toLowerCase.split("\\W+").filter(_.nonEmpty)
      if (w.length < n) Set(w.mkString(" ")) else (0 to w.length - n).map(i => w.slice(i, i + n).mkString(" ")).toSet
    }
    val (ga, gb) = (grams(a), grams(b))
    if (ga.isEmpty && gb.isEmpty) 1.0
    else ga.intersect(gb).size.toDouble / ga.union(gb).size.toDouble
  }
}
