package graft

import org.apache.spark.sql.SparkSession

/**
 * Plan-inspection main: prints the formatted physical plan (and, after
 * execution, the AQE-final plan) for each query named in SPARK_GRAFT_ONLY
 * against SPARK_GRAFT_SF_DIR, using the same session configuration as
 * [[Bench]] so the plan inspected is the plan benchmarked.
 */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = BenchSession.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "q3_shipping").split(",").toSeq
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"===== $name: plan before execution =====")
      df.explain("formatted")
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"===== $name: rows=$n, ${(System.nanoTime() - t0) / 1e9}%.2f s; AQE-final plan =====")
      // After execution the AdaptiveSparkPlan holds the final (re-optimized)
      // plan — the one that actually ran.
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
