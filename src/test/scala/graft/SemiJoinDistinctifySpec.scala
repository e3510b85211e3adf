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

  // ---- Range-correlation shapes (q4 / q21) ------------------------------
  // Probe rows (k, a, d) and build rows (bk, bb, bd) with NULLs in every
  // position, max-ties across distinct and identical bb values,
  // single-supplier groups, all-NULL groups, and heavy duplication.
  private val probe3: Seq[(Option[Long], Option[Long], Option[Long])] = Seq(
    (Some(1L), Some(10L), Some(5L)),  // key 1: single supplier {10: d=7}
    (Some(1L), Some(11L), Some(5L)),
    (Some(1L), Some(11L), Some(8L)),
    (Some(2L), Some(10L), Some(6L)),  // key 2: two suppliers tie at max d
    (Some(2L), Some(20L), Some(6L)),
    (Some(2L), Some(99L), Some(7L)),
    (Some(3L), Some(7L), Some(1L)),   // key 3: all-NULL bd
    (Some(4L), Some(4L), Some(4L)),   // key 4: absent from build
    (Some(5L), Some(50L), Some(3L)),  // key 5: heavy dup, one supplier 50
    (Some(5L), Some(51L), Some(3L)),
    (Some(5L), Some(50L), Some(9L)),
    (Some(6L), Some(1L), Some(5L)),   // key 6: same-supplier tie at max
    (Some(1L), None, Some(7L)),       // NULL a
    (Some(1L), Some(10L), None),      // NULL d
    (None, Some(5L), Some(5L))        // NULL key
  )
  private val build3: Seq[(Option[Long], Option[Long], Option[Long])] =
    Seq.tabulate(400)(i => (Some(5L), Some(50L), Some(4L))) ++ Seq(
      (Some(1L), Some(10L), Some(7L)),
      (Some(1L), Some(10L), Some(2L)),
      (Some(2L), Some(10L), Some(6L)), (Some(2L), Some(20L), Some(6L)),
      (Some(2L), Some(30L), Some(1L)),
      (Some(3L), Some(1L), None), (Some(3L), None, Some(9L)),
      (Some(5L), Some(50L), Some(8L)), (Some(5L), Some(60L), Some(5L)),
      (Some(6L), Some(1L), Some(5L)), (Some(6L), Some(1L), Some(5L)),
      (None, Some(1L), Some(9L))
    )

  private def frames3(threshold: String): (DataFrame, DataFrame) = {
    Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).foreach(spark.conf.set(_, threshold))
    // Multiple build partitions so partial buffers exercise the MERGE path
    // (parallelize, not repartition — a Repartition node would fail the
    // bare-build gate, which admits only Projects/IsNotNull above a leaf).
    (probe3.toDF("k", "a", "d"),
      spark.sparkContext.parallelize(build3, 7).toDF("bk", "bb", "bd"))
  }

  /** Plain-Scala three-valued EXISTS over build3: `bk = k [AND bb <> a]
    * AND (bd OP d)` with OP applied as `op(bd, d)`. */
  private def existsTruth3(
      rows: Seq[(Option[Long], Option[Long], Option[Long])],
      k: Option[Long], a: Option[Long], d: Option[Long],
      neq: Boolean, op: (Long, Long) => Boolean): Boolean =
    rows.exists { case (bk, bb, bd) =>
      k.isDefined && bk.isDefined && k.get == bk.get &&
        (!neq || (a.isDefined && bb.isDefined && a.get != bb.get)) &&
        (d.isDefined && bd.isDefined && op(bd.get, d.get))
    }

  private def canon3(rows: Seq[(Option[Long], Option[Long], Option[Long])]): Seq[String] =
    rows.map(_.toString).sorted

  private def checkShape3(
      rows: Seq[(Option[Long], Option[Long], Option[Long])],
      p: DataFrame, b: DataFrame,
      cond: org.apache.spark.sql.Column, neq: Boolean,
      op: (Long, Long) => Boolean, label: String): Unit = {
    for (joinType <- Seq("left_semi", "left_anti")) {
      val df = p.join(b, cond, joinType)
      assert(buildHasAggregate(df), s"$label/$joinType: build not aggregated")
      val got = canon3(df.as[(Option[Long], Option[Long], Option[Long])].collect().toSeq)
      val want = canon3(rows.filter { case (k, a, d) =>
        existsTruth3(build3, k, a, d, neq, op) == (joinType == "left_semi")
      })
      assert(got == want, s"$label/$joinType mismatch:\n got $got\nwant $want")
    }
  }

  test("equality + range (q4 shape): extreme rewrite, both orientations, null semantics exact") {
    try {
      val (p, b) = frames3(threshold = "1")
      checkShape3(probe3, p, b, p("k") === b("bk") && b("bd") > p("d"),
        neq = false, _ > _, "bd>d")
      checkShape3(probe3, p, b, p("k") === b("bk") && b("bd") <= p("d"),
        neq = false, _ <= _, "bd<=d")
      // Flipped operand order classifies through the mirrored branch.
      checkShape3(probe3, p, b, p("k") === b("bk") && p("d") >= b("bd"),
        neq = false, _ <= _, "d>=bd")
    } finally resetConf()
  }

  test("equality + <> + range (q21 shape): top-two-distinct rewrite, null semantics exact") {
    try {
      val (p, b) = frames3(threshold = "1")
      checkShape3(probe3, p, b,
        p("k") === b("bk") && p("a") =!= b("bb") && b("bd") > p("d"),
        neq = true, _ > _, "bb<>a,bd>d")
      checkShape3(probe3, p, b,
        p("k") === b("bk") && p("a") =!= b("bb") && b("bd") < p("d"),
        neq = true, _ < _, "bb<>a,bd<d")
    } finally resetConf()
  }

  test("q21 SQL NOT EXISTS route rewrites and matches ground truth") {
    try {
      val (p, b) = frames3(threshold = "1")
      p.createOrReplaceTempView("dsb3_probe")
      b.createOrReplaceTempView("dsb3_build")
      val df = spark.sql(
        """SELECT k, a, d FROM dsb3_probe
          |WHERE NOT EXISTS (SELECT 1 FROM dsb3_build
          |                  WHERE bk = k AND bb <> a AND bd > d)""".stripMargin)
      assert(buildHasAggregate(df))
      val got = canon3(df.as[(Option[Long], Option[Long], Option[Long])].collect().toSeq)
      val want = canon3(probe3.filterNot { case (k, a, d) =>
        existsTruth3(build3, k, a, d, neq = true, _ > _)
      })
      assert(got == want, s"got $got\nwant $want")
    } finally resetConf()
  }

  test("range rewrites: seeded fuzz across all four operators vs plain-Scala truth") {
    val rnd = new scala.util.Random(20260815L)
    def cell(n: Int): Option[Long] =
      if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(n).toLong)
    val fp = Seq.fill(60)((cell(8), cell(4), cell(8)))
    val fb = Seq.fill(300)((cell(8), cell(4), cell(8)))
    try {
      Seq(
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold"
      ).foreach(spark.conf.set(_, "1"))
      val p = fp.toDF("k", "a", "d")
      val b = spark.sparkContext.parallelize(fb, 5).toDF("bk", "bb", "bd")
      val ops: Seq[(String, org.apache.spark.sql.Column, (Long, Long) => Boolean)] = Seq(
        (">", b("bd") > p("d"), _ > _),
        (">=", b("bd") >= p("d"), _ >= _),
        ("<", b("bd") < p("d"), _ < _),
        ("<=", b("bd") <= p("d"), _ <= _))
      for ((opName, opCol, opFn) <- ops; neq <- Seq(false, true);
           joinType <- Seq("left_semi", "left_anti")) {
        val cond =
          if (neq) p("k") === b("bk") && p("a") =!= b("bb") && opCol
          else p("k") === b("bk") && opCol
        val df = p.join(b, cond, joinType)
        assert(buildHasAggregate(df), s"fuzz $opName neq=$neq $joinType: no aggregate")
        val got = canon3(df.as[(Option[Long], Option[Long], Option[Long])].collect().toSeq)
        val want = canon3(fp.filter { case (k, a, d) =>
          fb.exists { case (bk, bb, bd) =>
            k.isDefined && bk.isDefined && k.get == bk.get &&
              (!neq || (a.isDefined && bb.isDefined && a.get != bb.get)) &&
              (d.isDefined && bd.isDefined && opFn(bd.get, d.get))
          } == (joinType == "left_semi")
        })
        assert(got == want, s"fuzz $opName neq=$neq $joinType mismatch:\n got $got\nwant $want")
      }
    } finally resetConf()
  }

  test("range on a key attr passes through as a constant-per-group conjunct") {
    try {
      val (p, b) = frames3(threshold = "1")
      // bk is both the equi key and the range operand: dedup suffices and
      // the original conjunct rebinds against the kept key column.
      val df = p.join(b, p("k") === b("bk") && b("bk") > p("a"), "left_semi")
      assert(buildHasAggregate(df))
      val got = canon3(df.as[(Option[Long], Option[Long], Option[Long])].collect().toSeq)
      val want = canon3(probe3.filter { case (k, a, _) =>
        build3.exists { case (bk, _, _) =>
          k.isDefined && bk.isDefined && k.get == bk.get &&
            a.isDefined && bk.get > a.get
        }
      })
      assert(got == want, s"got $got\nwant $want")
    } finally resetConf()
  }

  test("probe-side runtime bloom is cloned onto the rewritten build") {
    // Mirrors tq21 at sf10: the probe fact gains a might_contain filter from
    // a selective dim join (InjectRuntimeFilter), the semi/anti build is the
    // same fact scanned bare — Spark rejected it as an application side, so
    // only the strategy's clone can key-prune it before the aggregate.
    val bloomConfs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "1")
    try {
      bloomConfs.foreach { case (k, v) => spark.conf.set(k, v) }
      // Probe fact: keys 0..99, three rows each; dim keeps keys % 5 == 0.
      // Written as parquet: InjectRuntimeFilter sizes the application side
      // from file scans and declines in-memory relations.
      val probeRows = (0 until 300).map(i => (i % 100L, (i % 7).toLong, (i % 11).toLong))
      val dimRows = (0 until 100).map(i => (i.toLong, i % 5))
      val buildRows = (0 until 4000).map(i => ((i % 200).toLong, (i % 3).toLong, (i % 13).toLong))
      val dir = tmpDir("bloomclone")
      probeRows.toDF("k", "a", "c").write.parquet(s"$dir/probe")
      dimRows.toDF("dk", "flag").write.parquet(s"$dir/dim")
      buildRows.toDF("bk", "bb", "bd").write.parquet(s"$dir/build")
      spark.read.parquet(s"$dir/probe").createOrReplaceTempView("bc_probe")
      spark.read.parquet(s"$dir/dim").createOrReplaceTempView("bc_dim")
      spark.read.parquet(s"$dir/build").createOrReplaceTempView("bc_build")
      val df = spark.sql(
        """SELECT k, a, c FROM bc_probe JOIN bc_dim ON k = dk AND flag = 0
          |WHERE NOT EXISTS (SELECT 1 FROM bc_build
          |                  WHERE bk = k AND bb <> a AND bd > c)""".stripMargin)
      val plan = finalPlan(df)
      val joins = collectAll(plan) {
        case j: BaseJoinExec if j.joinType == LeftAnti => j
      }
      assert(joins.size == 1, s"expected one anti join:\n$plan")
      val buildFilters = collectAll(joins.head.children(1)) {
        case f: org.apache.spark.sql.execution.FilterExec => f
      }
      assert(buildFilters.exists(_.condition.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain])),
        s"no cloned might_contain on the build side:\n$plan")
      assert(collectAll(joins.head.children(1)) {
        case a: BaseAggregateExec => a }.nonEmpty, "build not aggregated")
      val got = df.as[(Long, Long, Long)].collect().toSeq.sorted
      val want = probeRows
        .filter { case (k, _, _) => k % 5 == 0 }
        .filterNot { case (k, a, c) =>
          buildRows.exists { case (bk, bb, bd) => bk == k && bb != a && bd > c } }
        .sorted
      assert(got == want, s"got $got\nwant $want")
    } finally (bloomConfs.keys).foreach(spark.conf.unset)
  }

  test("bloom behind a Union branch is NOT cloned (other branches bypassed it)") {
    // Union reuses its FIRST child's exprIds for output, so a bloom injected
    // into one branch textually matches the semi-join key — but rows from
    // the other branch never flowed through it. Cloning it onto the build
    // would prune key groups those rows legitimately match (rows missing
    // from LeftSemi). The collection walk must stop at the Union.
    // PushDownLeftSemiAntiJoin is excluded so the Union actually SURVIVES
    // below the semi join (Catalyst otherwise duplicates the semi per
    // branch, where the per-branch clone is sound) — the fix must hold for
    // whatever plan shape reaches the planner.
    val bloomConfs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.excludedRules" ->
        "org.apache.spark.sql.catalyst.optimizer.PushDownLeftSemiAntiJoin",
      "spark.sql.autoBroadcastJoinThreshold" -> "1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "1")
    try {
      bloomConfs.foreach { case (k, v) => spark.conf.set(k, v) }
      val probeRows = (0 until 300).map(i => (i % 100L, (i % 7).toLong))
      val dimRows = (0 until 100).map(i => (i.toLong, i % 5))
      val extraRows = Seq((101L, 1L), (102L, 2L), (103L, 3L)) // keys only in branch 2
      val buildRows = (0 until 4000).map(i => ((i % 200).toLong, (i % 3).toLong))
      val dir = tmpDir("bloomunion")
      probeRows.toDF("k", "a").write.parquet(s"$dir/probe")
      dimRows.toDF("dk", "flag").write.parquet(s"$dir/dim")
      extraRows.toDF("k", "a").write.parquet(s"$dir/extra")
      buildRows.toDF("bk", "bb").write.parquet(s"$dir/build")
      // Explicit DataFrame semi join (not an EXISTS in a WHERE — predicate
      // pushdown would duplicate the subquery filter per branch long before
      // the subquery rewrite, dissolving the shape under test).
      val probeT = spark.read.parquet(s"$dir/probe")
      val dimT = spark.read.parquet(s"$dir/dim")
      val extraT = spark.read.parquet(s"$dir/extra")
      val buildT = spark.read.parquet(s"$dir/build")
      val branch1 = probeT.join(dimT,
        probeT("k") === dimT("dk") && dimT("flag") === 0).select(probeT("k"), probeT("a"))
      val u = branch1.union(extraT)
      val df = u.join(buildT, u("k") === buildT("bk"), "left_semi")
      val plan = finalPlan(df)
      val joins = collectAll(plan) {
        case j: BaseJoinExec if j.joinType == LeftSemi => j
      }
      assert(joins.size == 1, s"expected one semi join:\n$plan")
      // The rewrite itself (aggregate build) should still fire — only the
      // bloom clone must not.
      assert(collectAll(joins.head.children(1)) {
        case a: BaseAggregateExec => a }.nonEmpty, "build not aggregated")
      // Scenario guard: the bloom must actually exist inside the Union's
      // first branch, or this test asserts nothing.
      assert(collectAll(joins.head.children(0)) {
        case f: org.apache.spark.sql.execution.FilterExec
            if f.condition.exists(
              _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]) => f
      }.nonEmpty, s"no injected bloom in the probe branch — test shape degraded:\n$plan")
      val buildFilters = collectAll(joins.head.children(1)) {
        case f: org.apache.spark.sql.execution.FilterExec => f
      }
      assert(!buildFilters.exists(_.condition.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain])),
        s"bloom from a Union branch was cloned onto the build:\n$plan")
      val got = df.as[(Long, Long)].collect().toSeq.sorted
      val want = (probeRows.filter(_._1 % 5 == 0) ++ extraRows)
        .filter { case (k, _) => buildRows.exists(_._1 == k) }.sorted
      assert(got == want, s"got $got\nwant $want")
      assert(extraRows.forall(got.contains), "Union branch-2 rows were pruned")
    } finally (bloomConfs.keys).foreach(spark.conf.unset)
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
