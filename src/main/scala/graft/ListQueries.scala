package graft

/** Prints every SparkEntry query name (bench tooling — no SparkSession). */
object ListQueries {
  def main(args: Array[String]): Unit =
    SparkEntry.queries.keys.toSeq.sorted.foreach(println)
}
