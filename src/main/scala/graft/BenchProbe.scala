package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import scala.collection.mutable

/** Scratch probe for stage-level timing (not part of the driver contract;
  * used to pick Bench configs and find per-query hot spots). */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobStart = mutable.Map[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobStart(j.jobId) = j.time
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        println(f"  JOB ${j.jobId}%3d: ${(j.time - jobStart.getOrElse(j.jobId, j.time)) / 1e3}%.2f s")
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        println(f"    STAGE ${si.stageId}%3d ${si.name.take(40)}%-40s tasks=${si.numTasks}%3d ${dur}%.2f s")
      }
    })
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm
    SparkEntry.queries("dedup_minhash")(spark, dir).count()
    println("=== timed run ===")
    time("full dedup_minhash")(SparkEntry.queries("dedup_minhash")(spark, dir).count())
    spark.stop()
  }
}
