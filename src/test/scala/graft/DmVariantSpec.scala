package graft

/**
 * Modified-data (dm) bench variant: [[Fixtures.dm]] tables accumulate N
 * rounds of merge-on-read DELETE + identity-UPDATE, and the tq queries
 * routed through them must return exactly what the same SQL returns over
 * parquet with the deleted key slices filtered out (updates are identity,
 * so values are unchanged). Run under the bench session's join confs —
 * the combination that exposed the AQE-replan restructuring crash in
 * PullUpSemiAntiJoins (LeftAnti planned with a broadcast stage on its
 * build-left).
 */
class DmVariantSpec extends SparkSpec {

  private val confs = Map(
    "spark.sql.join.preferSortMergeJoin" -> "false",
    "spark.sql.autoBroadcastJoinThreshold" -> "16m",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "64m")

  test("tq18/tq4 over dm fixtures match the delete-filtered parquet oracle") {
    val sfDir = "/root/testdata/sf0.001"
    val rounds = 5
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      sys.props("spark.graft.tq.dm") = rounds.toString
      // Oracle views: parquet minus the dm-deleted key slices (the
      // identity updates change no values). dm routing refreshes ONLY
      // orders+lineitem, like the reference's dm=5 batches — customer
      // reads the unmodified table.
      val keys = Map("orders" -> "o_orderkey", "lineitem" -> "l_orderkey")
      spark.read.parquet(s"$sfDir/customer.parquet").createOrReplaceTempView("dmo_customer")
      Seq("orders", "lineitem").foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet")
          .filter(s"NOT (${keys(t)} % 1000 BETWEEN 1 AND $rounds)")
          .createOrReplaceTempView(s"dmo_$t")
      }
      val oracle18 = spark.sql(
        """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, round(sum(l_quantity), 2) AS total_qty
          |FROM dmo_customer, dmo_orders, dmo_lineitem
          |WHERE o_orderkey IN (SELECT l_orderkey FROM dmo_lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
          |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
          |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
          |ORDER BY o_totalprice DESC, o_orderkey
          |LIMIT 100""".stripMargin).collect().map(_.toString).toSeq
      val got18 = SparkEntry.queries("tq18_large_volume")(spark, sfDir)
        .collect().map(_.toString).toSeq
      assert(got18 == oracle18, s"tq18 dm mismatch: ${got18.size} vs ${oracle18.size}")

      val oracle4 = spark.sql(
        """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
          |FROM dmo_orders
          |WHERE o_orderdate >= '1996-07-01' AND o_orderdate < '1996-10-01'
          |  AND EXISTS (SELECT 1 FROM dmo_lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
          |GROUP BY o_orderpriority""".stripMargin)
        .collect().map(_.toString).sorted.toSeq
      val got4 = SparkEntry.queries("tq4_priority_exists")(spark, sfDir)
        .collect().map(_.toString).sorted.toSeq
      assert(got4 == oracle4, s"tq4 dm mismatch: ${got4.size} vs ${oracle4.size}")
    } finally {
      sys.props.remove("spark.graft.tq.dm")
      confs.keys.foreach(spark.conf.unset)
    }
  }
}
