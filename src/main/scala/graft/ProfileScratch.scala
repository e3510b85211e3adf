package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.pipeline.Dedup

/** Temporary profiling harness for dedup_minhash — delete before commit. */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("profile").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = scala.collection.mutable.ArrayBuffer[(String, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L))
        stages += ((si.name.take(80), dur, si.numTasks))
      }
    })

    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def build() = {
      val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
      val mutated = d.select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" appended-tail-token")).as("text"))
      d.union(mutated)
    }

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    time("warmup run")(
      println("pairs=" + Dedup.minhashNearDuplicates(build(), "text", "doc_id", threshold = 0.7).count()))
    stages.clear()
    time("timed run")(
      println("pairs=" + Dedup.minhashNearDuplicates(build(), "text", "doc_id", threshold = 0.7).count()))
    println("== stages (ms, tasks) ==")
    stages.sortBy(-_._2).take(20).foreach { case (n, d, t) => println(f"$d%6d ms $t%3d tasks  $n") }

    spark.stop()
  }
}
