package graft

/** Driver-contract smoke: `entry` returns rows at sf0.001, every oracle key
  * has a query, and query names are stable identifiers. */
class SmokeSpec extends SparkSpec {

  test("entry() flagship query returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("spark.sql works over a registered Iceberg view") {
    val path = Fixtures.lineitemPlain(spark, sfDir)
    IcebergTable.createOrReplaceView(spark, path, "li")
    val n = spark.sql("SELECT count(*) FROM li WHERE l_quantity > 25").collect()(0).getLong(0)
    val expected = spark.read.parquet(s"$sfDir/lineitem.parquet").filter("l_quantity > 25").count()
    assert(n == expected)
    val agg = spark.sql(
      "SELECT l_returnflag, sum(l_quantity) q FROM li GROUP BY 1 ORDER BY 1")
    assert(agg.count() > 0)
  }

  test("all queries run and return a schema at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sfDir).schema; None }
      catch { case e: Exception => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
