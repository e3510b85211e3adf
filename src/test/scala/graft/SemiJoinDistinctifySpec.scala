package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}

/**
 * [[graft.plans.DistinctifySemiAntiBuilds]]: shuffle-sized semi/anti build
 * sides are reduced to key-level aggregates (distinct keys for pure
 * equality; min/max for the q21 `key = key AND a <> b` correlation,
 * `tpch.benchmark.in:68-71`) — with exact three-valued-logic parity on
 * NULL keys, NULL inequality operands, and all-NULL groups.
 */
class SemiJoinDistinctifySpec extends SparkSpec {

  import spark.implicits._

  // Probe rows: (key, attr). NULL keys and NULL attrs included. Build rows
  // carry heavy key duplication (what the rewrite exists to collapse) plus
  // groups that are single-valued, multi-valued, all-NULL, and absent.
  private val probe: Seq[(Option[Long], Option[Long])] = Seq(
    (Some(1L), Some(10L)), // key 1: build has {10} only
    (Some(2L), Some(10L)), // key 2: build has {10, 20}
    (Some(2L), Some(99L)),
    (Some(3L), Some(7L)),  // key 3: build has all-NULL attrs
    (Some(4L), Some(4L)),  // key 4: not in build
    (Some(1L), None),      // NULL attr: a <> b never true
    (None, Some(5L)),      // NULL key: never matches
    (Some(5L), Some(50L)), // key 5: build has {50} many times over
    (Some(5L), Some(51L))
  )
  private val build: Seq[(Option[Long], Option[Long])] =
    Seq.tabulate(500)(i => (Some(5L), Some(50L))) ++ Seq(
      (Some(1L), Some(10L)),
      (Some(2L), Some(10L)), (Some(2L), Some(20L)),
      (Some(3L), None), (Some(3L), None),
      (None, Some(1L))
    )

  private def frames(threshold: String): (DataFrame, DataFrame) = {
    Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).foreach(spark.conf.set(_, threshold))
    (probe.toDF("k", "a"), build.toDF("bk", "bb"))
  }

  private def resetConf(): Unit = Seq(
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.autoBroadcastJoinThreshold"
  ).foreach(spark.conf.unset)

  private def finalPlan(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def collectAll[T](p: SparkPlan)(f: PartialFunction[SparkPlan, T]): Seq[T] = {
    val here = Seq(p).collect(f)
    val below = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => collectAll(q.plan)(f)
      case other => other.children.flatMap(collectAll(_)(f))
    }
    here ++ below
  }

  private def buildHasAggregate(df: DataFrame): Boolean = {
    val joins = collectAll(finalPlan(df)) {
      case j: BaseJoinExec if j.joinType == LeftSemi || j.joinType == LeftAnti => j
    }
    assert(joins.size == 1, s"expected one semi/anti join:\n${finalPlan(df)}")
    collectAll(joins.head.children(1)) { case a: BaseAggregateExec => a }.nonEmpty
  }

  private def canon(rows: Seq[(Option[Long], Option[Long])]): Seq[String] =
    rows.map(_.toString).sorted

  // Ground truth computed with plain Scala three-valued EXISTS semantics.
  private def existsTruth(k: Option[Long], a: Option[Long], neq: Boolean): Boolean =
    build.exists { case (bk, bb) =>
      k.isDefined && bk.isDefined && k.get == bk.get &&
        (!neq || (a.isDefined && bb.isDefined && a.get != bb.get))
    }

  test("pure-equality semi/anti: build reduced to distinct keys, results exact") {
    try {
      val (p, b) = frames(threshold = "1")
      val semi = p.join(b, p("k") === b("bk"), "left_semi")
      val anti = p.join(b, p("k") === b("bk"), "left_anti")
      assert(buildHasAggregate(semi), "semi build was not distinctified")
      assert(buildHasAggregate(anti), "anti build was not distinctified")
      val gotSemi = canon(semi.as[(Option[Long], Option[Long])].collect().toSeq)
      val gotAnti = canon(anti.as[(Option[Long], Option[Long])].collect().toSeq)
      assert(gotSemi == canon(probe.filter { case (k, a) => existsTruth(k, a, neq = false) }))
      assert(gotAnti == canon(probe.filterNot { case (k, a) => existsTruth(k, a, neq = false) }))
    } finally resetConf()
  }

  test("equality + inequality (q21 shape): min/max rewrite, null semantics exact") {
    try {
      val (p, b) = frames(threshold = "1")
      val cond = p("k") === b("bk") && p("a") =!= b("bb")
      val semi = p.join(b, cond, "left_semi")
      val anti = p.join(b, cond, "left_anti")
      assert(buildHasAggregate(semi), "semi build was not min/max-reduced")
      assert(buildHasAggregate(anti), "anti build was not min/max-reduced")
      val gotSemi = canon(semi.as[(Option[Long], Option[Long])].collect().toSeq)
      val gotAnti = canon(anti.as[(Option[Long], Option[Long])].collect().toSeq)
      assert(gotSemi == canon(probe.filter { case (k, a) => existsTruth(k, a, neq = true) }),
        s"semi mismatch: $gotSemi")
      assert(gotAnti == canon(probe.filterNot { case (k, a) => existsTruth(k, a, neq = true) }),
        s"anti mismatch: $gotAnti")
    } finally resetConf()
  }

  test("SQL EXISTS route produces the same rewrite and results") {
    try {
      val (p, b) = frames(threshold = "1")
      p.createOrReplaceTempView("dsb_probe")
      b.createOrReplaceTempView("dsb_build")
      val df = spark.sql(
        """SELECT k, a FROM dsb_probe
          |WHERE EXISTS (SELECT 1 FROM dsb_build WHERE bk = k AND bb <> a)""".stripMargin)
      assert(buildHasAggregate(df))
      val got = canon(df.as[(Option[Long], Option[Long])].collect().toSeq)
      assert(got == canon(probe.filter { case (k, a) => existsTruth(k, a, neq = true) }))
    } finally resetConf()
  }

  test("gates: broadcastable build, aggregated build, kill switch") {
    // Broadcast-sized build: no rewrite (the hash table dedups for free).
    try {
      val (p, b) = frames(threshold = "10485760")
      assert(!buildHasAggregate(p.join(b, p("k") === b("bk"), "left_semi")),
        "rewrite fired on a broadcastable build")
    } finally resetConf()
    // Already-aggregated build (IN over GROUP BY): exactly one aggregate —
    // the query's own — no second one stacked on top.
    try {
      val (p, b) = frames(threshold = "1")
      p.createOrReplaceTempView("dsb_probe")
      b.createOrReplaceTempView("dsb_build")
      val df = spark.sql(
        """SELECT k, a FROM dsb_probe WHERE k IN
          |  (SELECT bk FROM dsb_build GROUP BY bk HAVING count(*) > 1)""".stripMargin)
      val joins = collectAll(finalPlan(df)) {
        case j: BaseJoinExec if j.joinType == LeftSemi => j
      }
      assert(joins.size == 1)
      // Physical agg pairs (partial+final) of ONE logical aggregate carry
      // count(*); a stacked distinctify agg would add a count-free pair.
      val aggs = collectAll(joins.head.children(1)) { case a: BaseAggregateExec => a }
      assert(aggs.nonEmpty && aggs.forall(_.aggregateExpressions.nonEmpty),
        s"distinctify stacked a second aggregate:\n${finalPlan(df)}")
    } finally resetConf()
    // Data-filtered build: the build has already passed a selectivity the
    // planner can't estimate; the bare-scan gate must hold the rewrite
    // back (measured +19% on the q_semi shape when it fired anyway).
    // Parquet-backed build — a filtered LocalRelation constant-folds back
    // into a bare LocalRelation and would dodge the gate being tested.
    try {
      val (p, _) = frames(threshold = "1")
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val filtered = li.filter(li("l_quantity") > 45L).select(li("l_orderkey"))
      val bare = li.select(li("l_orderkey"))
      assert(!buildHasAggregate(
        p.join(filtered, p("k") === filtered("l_orderkey"), "left_semi")),
        "rewrite fired on a data-filtered build")
      assert(buildHasAggregate(
        p.join(bare, p("k") === bare("l_orderkey"), "left_semi")),
        "rewrite did not fire on a bare parquet build")
    } finally resetConf()
    // Kill switch.
    try {
      val (p, b) = frames(threshold = "1")
      spark.conf.set("spark.graft.distinctifySemiAntiBuilds", "false")
      assert(!buildHasAggregate(p.join(b, p("k") === b("bk"), "left_semi")),
        "rewrite fired with the kill switch off")
    } finally {
      spark.conf.unset("spark.graft.distinctifySemiAntiBuilds")
      resetConf()
    }
  }
}
