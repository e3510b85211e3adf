package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import scala.collection.mutable

/** Scratch probe (not part of the driver contract; used to pick Bench
  * configs and find per-query hot spots). Splits a query's timed pass into
  * DataFrame construction (fixture view registration + analysis) vs
  * execution, with per-job/stage timings — the decomposition behind the
  * "fixed per-query floor" work on tq13/tq22 under the delay3 protocol.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_ONLY (comma list),
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_FS_DELAY_MS (inherited by TpchExtra),
  * SPARK_GRAFT_PROBE_STAGES=1 for stage noise.
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "tq22_acctbal").split(",").toSeq
    val spark = BenchSession.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("SPARK_GRAFT_PROBE_STAGES")) {
      val jobStart = mutable.Map[Int, Long]()
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit = jobStart(j.jobId) = j.time
        override def onJobEnd(j: SparkListenerJobEnd): Unit =
          println(f"  JOB ${j.jobId}%3d: ${(j.time - jobStart.getOrElse(j.jobId, j.time)) / 1e3}%.2f s")
        override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
          val si = s.stageInfo
          val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
          val m = si.taskMetrics
          val sw = m.shuffleWriteMetrics.bytesWritten / 1e6
          val sr = m.shuffleReadMetrics.totalBytesRead / 1e6
          println(f"    STAGE ${si.stageId}%3d ${si.name.take(40)}%-40s tasks=${si.numTasks}%3d ${dur}%.2f s swMB=$sw%.1f srMB=$sr%.1f")
        }
      })
    }
    names.foreach { name =>
      SparkEntry.queries(name)(spark, dir).count() // warmup: fixtures + JIT
      spark.catalog.clearCache()
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        println(f"PROBE $name pass$pass: construct=${(t1 - t0) / 1e9}%.2f plan=${(t2 - t1) / 1e9}%.2f exec=${(t3 - t2) / 1e9}%.2f total=${(t3 - t0) / 1e9}%.2f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
