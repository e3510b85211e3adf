package graft

import graft.pipeline.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ANN-at-scale probe (measurement tooling, like [[BenchProbe]]): on the
  * 1M-vector corpus from scripts/gen_embeddings_large.py, measure
  * brute-force top-k vs the IVF probe over a persisted index, plus the
  * probe's recall against the exact ranking. Prints one summary block. */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_EMB_DIR", "/root/repo/localdata/emb1m")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "24g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    println(s"corpus: ${emb.count()} vectors")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val idxDir = s"$dir/ivf_idx"
    val haveIdx = new java.io.File(s"$idxDir/centroids").exists()
    val index = if (haveIdx) Similarity.loadIvfIndex(spark, idxDir)
    else {
      val built = time("IVF build (k=64, 2% train fraction, incl. assignment+persist)") {
        val ix = Similarity.buildIvfIndex(emb, "embedding", "vec_id",
          numCells = 64, trainFraction = 0.02)
        Similarity.saveIvfIndex(ix, idxDir)
        ix
      }
      Similarity.loadIvfIndex(spark, idxDir)
    }

    val query = emb.filter(col("vec_id") === 17L).select("embedding")
      .collect()(0).getSeq[Float](0)

    // Warm the file cache once so both paths measure compute, not first IO.
    emb.count(); index.cells.count()

    val exact = time("brute-force top-20 over 1M") {
      Similarity.bruteForceTopK(emb, "embedding", "vec_id", query, 20).collect()
    }
    for (nprobe <- Seq(2, 4, 8)) {
      val approx = time(s"IVF probe top-20 (nprobe=$nprobe of 64 cells)") {
        Similarity.ivfTopKIndexed(index, "embedding", "vec_id", query, 20, nprobe).collect()
      }
      val recall = approx.map(_.getLong(0)).toSet
        .intersect(exact.map(_.getLong(0)).toSet).size / 20.0
      val scanned = Similarity.ivfCandidates(index, query, nprobe).count()
      println(f"RESULT nprobe=$nprobe recall@20=$recall%.2f scanned=$scanned of 1000000")
    }
    spark.stop()
  }
}
