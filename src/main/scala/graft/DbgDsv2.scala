package graft
object DbgDsv2 {
  def main(args: Array[String]): Unit = {
    val spark = BenchSession.session("4")
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(sys.env.getOrElse("DBG_Q", "tq12_priority_class"))(spark, "localdata/sf10")
    df.queryExecution.optimizedPlan
    spark.stop()
  }
}
