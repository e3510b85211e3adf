package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BaseJoinExec, HashJoin}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti, LeftSemi}

/**
 * [[graft.plans.PullUpSemiAntiJoins]]: EXISTS/NOT-EXISTS semi/anti joins
 * whose build side is shuffle-sized must run ABOVE an adjacent
 * broadcast-sized inner join, not below it (the q21 waiting-supplier
 * placement, `tpch.benchmark.in:68-71`) — and the rewrite must not change
 * results or fire when the gates don't hold.
 */
class SemiJoinPlacementSpec extends SparkSpec {

  import spark.implicits._

  // Deterministic synthetic tables sized so the EXISTS build side is NOT
  // broadcastable under a 256 KB threshold but the dimension is.
  private def withTables[T](thresholdBytes: String = "262144")(body: => T): T = {
    val fact = (0 until 20000).map(i => (i.toLong % 997, i.toLong % 13, i.toLong % 7, i.toLong))
      .toDF("f_key", "f_dim", "f_val", "f_id")
    val dim = (0L until 13L).map(d => (d, if (d % 3 == 0) "keep" else "drop")).toDF("d_key", "d_tag")
    val big = (0 until 200000).map(i => (i.toLong % 997, i.toLong % 11)).toDF("b_key", "b_val")
    fact.createOrReplaceTempView("pu_fact")
    dim.createOrReplaceTempView("pu_dim")
    big.createOrReplaceTempView("pu_big")
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val olds = keys.map(k => k -> util.Try(spark.conf.get(k)).toOption.flatMap(Option(_)))
    try {
      keys.foreach(spark.conf.set(_, thresholdBytes))
      body
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private val existsSql =
    """SELECT f_id, d_tag FROM pu_fact JOIN pu_dim ON f_dim = d_key
      |WHERE d_tag = 'keep'
      |  AND EXISTS (SELECT 1 FROM pu_big WHERE b_key = f_key AND b_val > f_val)
      |  AND NOT EXISTS (SELECT 1 FROM pu_big WHERE b_key = f_key AND b_val = 10 AND f_val = 6)
      |""".stripMargin

  private def finalPlan(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  // collect() stops at AQE query-stage leaves; descend into their plans.
  private def joins(p: SparkPlan): Seq[BaseJoinExec] = {
    val below = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => joins(q.plan)
      case other => other.children.flatMap(joins)
    }
    p match { case j: BaseJoinExec => j +: below; case _ => below }
  }

  test("semi/anti joins are pulled above the broadcast dimension join") {
    withTables() {
      val df = spark.sql(existsSql)
      val plan = finalPlan(df)
      val js = joins(plan)
      val semi = js.filter(j => j.joinType == LeftSemi || j.joinType == LeftAnti)
      val inner = js.filter(_.joinType == Inner)
      assert(semi.size == 2 && inner.size == 1, s"unexpected join mix:\n$plan")
      // The inner (dimension) join must sit BELOW both semi/anti joins.
      assert(semi.forall(s => joins(s).exists(_.joinType == Inner)),
        s"inner dim join was not pulled below the semi/anti joins:\n$plan")
    }
  }

  test("rewrite preserves results exactly (vs computed expectation)") {
    withTables() {
      val got = spark.sql(existsSql).as[(Long, String)].collect().sorted.toSeq
      // Ground truth computed in plain Scala from the same generators.
      val bigRows = (0 until 200000).map(i => (i.toLong % 997, i.toLong % 11))
      val maxByKey = bigRows.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      val keys10 = bigRows.filter(_._2 == 10).map(_._1).toSet
      val expected = (0 until 20000).flatMap { i =>
        val (fk, fd, fv, fid) = (i.toLong % 997, i.toLong % 13, i.toLong % 7, i.toLong)
        val keepDim = fd % 3 == 0
        val exists = maxByKey.get(fk).exists(_ > fv)
        val notExists = !(fv == 6 && keys10.contains(fk))
        if (keepDim && exists && notExists) Some((fid, "keep")) else None
      }.sorted
      assert(got == expected, s"got ${got.size} rows, expected ${expected.size}")
    }
  }

  test("no rewrite when the dimension is not broadcastable or the build side is small") {
    // Gate 1: everything broadcastable (default thresholds) -> semi joins
    // stay where Catalyst put them (below the inner join) and results hold.
    withTables(thresholdBytes = "10485760") {
      val df = spark.sql(existsSql)
      val plan = finalPlan(df)
      val semi = joins(plan).filter(j => j.joinType == LeftSemi || j.joinType == LeftAnti)
      assert(semi.nonEmpty && semi.forall(s => !joins(s).exists(_.joinType == Inner)),
        s"rewrite fired although the build side is broadcast-sized:\n$plan")
    }
    // Gate 2: an AGGREGATED build side (IN over GROUP BY ... HAVING — the
    // q18 shape) is a selective key list; pulling it above the dim join
    // delays the most selective filter, so the rewrite must not fire.
    withTables() {
      val aggSql =
        """SELECT f_id, d_tag FROM pu_fact JOIN pu_dim ON f_dim = d_key
          |WHERE d_tag = 'keep'
          |  AND f_key IN (SELECT b_key FROM pu_big GROUP BY b_key HAVING sum(b_val) > 900)
          |""".stripMargin
      val plan = finalPlan(spark.sql(aggSql))
      val semi = joins(plan).filter(_.joinType == LeftSemi)
      assert(semi.nonEmpty && semi.forall(s => !joins(s).exists(_.joinType == Inner)),
        s"rewrite fired although the build side is an aggregate:\n$plan")
    }
    // Gate 3: conf kill switch.
    withTables() {
      spark.conf.set("spark.graft.pullUpSemiAntiJoins", "false")
      try {
        val plan = finalPlan(spark.sql(existsSql))
        val semi = joins(plan).filter(j => j.joinType == LeftSemi || j.joinType == LeftAnti)
        assert(semi.forall(s => !joins(s).exists(_.joinType == Inner)),
          s"rewrite fired with the kill switch off:\n$plan")
      } finally spark.conf.unset("spark.graft.pullUpSemiAntiJoins")
    }
  }
}
