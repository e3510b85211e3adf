package graft

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Differential parity net for the TUNED engine: the round-11 verdict's
 * residual trust gap was "one bad rewrite at a shape the spec doesn't
 * cover would ship a fast wrong number" — each late rule's own spec pins
 * the shapes it was written for, and the SPARK_GRAFT_TUNED Verify mode
 * oracles the fixture corpus, but neither covers shapes nobody thought
 * of. This suite generates a few hundred seeded-random queries across the
 * late rules' fire zones (agg-over-join with either-side groups/aggs and
 * null-bearing duplicate keys, IN-over-HAVING, EXISTS/NOT EXISTS chains)
 * and asserts the tuned session ([[BenchSession.lateRules]] + the tuned
 * runtime-filter confs, registered through the same code path the bench
 * uses) returns row-identical results to a stock session — on every
 * query, whether a rule fired or refused.
 *
 * Vacuity guard: the suite also counts queries whose optimized plans
 * diverge between the sessions and requires a minimum, so conf drift that
 * silently stopped every rule from firing fails the suite instead of
 * green-washing it.
 */
class TunedParitySpec extends SparkSpec {

  private lazy val stock: SparkSession = spark.newSession()
  private lazy val tuned: SparkSession = {
    val t = spark.newSession()
    BenchSession.registerLateRules(t)
    // The SQLConf-level half of BenchSession.builder (session-settable
    // subset): hash joins preferred, runtime blooms admitted at test-scale
    // scans. Static-vs-adaptive broadcast split stays per-query randomized
    // below — results must hold under any join strategy.
    t.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    t.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    t.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    t
  }

  private lazy val dataDir: String = {
    val dir = tmpDir("graft_parity_")
    val s = spark
    import s.implicits._
    // fact: duplicate join keys (~40 rows/key), nulls in key, group and
    // measure columns, an exact-decimal measure (float sums are excluded
    // from generation: reassociation noise is not a correctness signal).
    (0 until 8000).map { i =>
      (if (i % 41 == 0) None else Some((i % 200).toLong),
        if (i % 23 == 0) None else Some(i % 7),
        (i % 97).toLong,
        BigDecimal(i % 1000) * BigDecimal("0.25"),
        "s" + i % 13)
    }.toDF("f_k", "f_g", "f_v", "f_d", "f_s")
      .write.parquet(s"$dir/fact")
    // dimU: unique key 0..249 (fact keys 200..249 unmatched) + a null key.
    ((0 until 250).map(k => (Some(k.toLong), k % 5, "g" + k % 11)) :+
      ((None: Option[Long]), 99, "gnull"))
      .toDF("u_k", "u_a", "u_b").write.parquet(s"$dir/dimU")
    // dimD: 2-3 rows per key, nulls, covers only keys 0..239.
    (0 until 600).map { j =>
      (if (j % 53 == 0) None else Some((j % 240).toLong),
        j % 9, (j % 31).toLong)
    }.toDF("d_k", "d_x", "d_y").write.parquet(s"$dir/dimD")
    for (sess <- Seq(stock, tuned); t <- Seq("fact", "dimU", "dimD"))
      sess.read.parquet(s"$dir/$t").createOrReplaceTempView(t)
    dir
  }

  // ---- seeded query generator ----

  private def pick[T](r: Random, xs: Seq[T]): T = xs(r.nextInt(xs.length))

  private def aggJoinQuery(r: Random): String = {
    val left = r.nextBoolean()
    val joinType = if (left) "LEFT JOIN" else "JOIN"
    val (dim, dk, dimCols) =
      if (r.nextBoolean()) ("dimU", "u_k", Seq("u_a", "u_b"))
      else ("dimD", "d_k", Seq("d_x", "d_y"))
    val extra = r.nextInt(4) match {
      case 0 => ""
      case 1 => s" AND d.${dimCols.head} > ${r.nextInt(5)}"   // dim-only conjunct
      case 2 => s" AND f.f_v > ${r.nextInt(60)}"              // fact-only conjunct
      case _ => s" AND d.${dimCols.head} >= ${r.nextInt(3)} AND f.f_s <> 's${r.nextInt(13)}'"
    }
    val where = r.nextInt(3) match {
      case 0 => ""
      case 1 => s" WHERE f.f_g IS NOT NULL AND f.f_v < ${40 + r.nextInt(50)}"
      case _ => s" WHERE f.f_s IN ('s1','s2','s${r.nextInt(13)}')"
    }
    val groupPool = Seq("f.f_k", "f.f_g", "f.f_s", s"d.${dimCols.head}")
    val groups = r.shuffle(groupPool).take(r.nextInt(3)).distinct
    val aggPool = Seq(
      "count(*)", s"count(d.${dimCols.head})", "count(f.f_v)",
      "sum(f.f_v)", "sum(f.f_d)", s"min(d.${dimCols.last})",
      s"max(d.${dimCols.last})", "min(f.f_s)", "max(f.f_v)",
      s"sum(d.${dimCols.last})".replace("sum(d.u_b)", "count(d.u_b)")) // u_b is string
    val aggs = r.shuffle(aggPool).take(1 + r.nextInt(3)).distinct
      .zipWithIndex.map { case (a, i) => s"$a AS a$i" }
    val select = (groups ++ aggs).mkString(", ")
    val groupBy = if (groups.isEmpty) "" else s" GROUP BY ${groups.mkString(", ")}"
    val having =
      if (groups.nonEmpty && r.nextInt(3) == 0) s" HAVING count(*) > ${r.nextInt(4)}"
      else ""
    s"SELECT $select FROM fact f $joinType $dim d ON f.f_k = d.$dk$extra$where$groupBy$having"
  }

  private def semiAggQuery(r: Random): String = {
    // The q18 fire zone: IN over a HAVING aggregate on the same table.
    val threshold = 150 + r.nextInt(200)
    val aggFn = pick(r, Seq("sum(f_v)", "sum(f_d)", "count(*)"))
    val outerAgg = pick(r, Seq("count(*) AS c", "sum(f.f_v) AS s", "max(f.f_s) AS m"))
    s"""SELECT f.f_k, $outerAgg FROM fact f
       | WHERE f.f_k IN (SELECT f_k FROM fact GROUP BY f_k HAVING $aggFn > $threshold)
       | GROUP BY f.f_k""".stripMargin
  }

  private def existsQuery(r: Random): String = {
    val not = if (r.nextBoolean()) "NOT " else ""
    val pred = s"d.d_x > ${r.nextInt(7)}"
    val agg = pick(r, Seq("count(*) AS c", "sum(f.f_v) AS s", "min(f.f_k) AS k"))
    val group = if (r.nextBoolean()) "f.f_g" else "f.f_s"
    s"""SELECT $group, $agg FROM fact f
       | WHERE ${not}EXISTS (SELECT 1 FROM dimD d WHERE d.d_k = f.f_k AND $pred)
       | GROUP BY $group""".stripMargin
  }

  private def chainQuery(r: Random): String = {
    // Two-hop chain (bloom fire zone): fact -> dimD -> dimU with a
    // selective literal filter at the far end.
    val agg = pick(r, Seq("count(*) AS c", "sum(f.f_v) AS s"))
    s"""SELECT $agg FROM fact f
       | JOIN dimD d ON f.f_k = d.d_k
       | JOIN dimU u ON d.d_k = u.u_k
       | WHERE u.u_a = ${r.nextInt(5)} AND d.d_y < ${5 + r.nextInt(20)}""".stripMargin
  }

  private def emptyJoinQuery(r: Random): String = {
    // Empty-join GLOBAL aggregates (no GROUP BY): the fixtures above
    // guarantee every generated join matches, so the zero-row global case
    // — where a count() recombined as a bare re-sum yields NULL instead
    // of 0 — was structurally unreachable by the other arms. Emptiness via
    // an always-false dim conjunct, a disjoint key space, or an
    // always-false fact WHERE; one arm stays non-empty as a control.
    val joinType = if (r.nextBoolean()) "JOIN" else "LEFT JOIN"
    val emptiness = r.nextInt(3) match {
      case 0 => s" AND d.d_x > ${900 + r.nextInt(100)}" // dim conjunct never true
      case 1 => " AND d.d_k > 1000"                     // disjoint key space
      case _ => ""                                      // non-empty control
    }
    val where = r.nextInt(3) match {
      case 0 => " WHERE f.f_v > 5000" // empties the preserved side too
      case 1 => s" WHERE f.f_v < ${r.nextInt(40)}"
      case _ => ""
    }
    val aggs = r.shuffle(Seq("count(*)", "count(d.d_x)", "count(f.f_v)",
      "sum(f.f_v)", "sum(f.f_d)", "min(d.d_y)", "max(f.f_v)"))
      .take(1 + r.nextInt(3)).zipWithIndex.map { case (a, i) => s"$a AS a$i" }
    s"SELECT ${aggs.mkString(", ")} FROM fact f $joinType dimD d ON f.f_k = d.d_k$emptiness$where"
  }

  private def generate(r: Random): String = r.nextInt(10) match {
    case 0 | 1 => semiAggQuery(r)
    case 2 | 3 => existsQuery(r)
    case 4     => chainQuery(r)
    case 5     => emptyJoinQuery(r)
    case _     => aggJoinQuery(r)
  }

  private def canonical(df: DataFrame): String =
    df.queryExecution.optimizedPlan.canonicalized.toString

  test("300 seeded random shapes: tuned session row-identical to stock") {
    dataDir // force fixture + view registration
    val r = new Random(20260816L)
    var rewritten = 0
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    for (i <- 0 until 300) {
      val sql = generate(r)
      // Randomize the tuned side's broadcast admission per query: results
      // must hold whether the rules' output broadcasts or shuffles.
      tuned.conf.set("spark.sql.autoBroadcastJoinThreshold",
        if (r.nextBoolean()) "-1" else "10MB")
      val a = stock.sql(sql)
      val b = tuned.sql(sql)
      if (canonical(a) != canonical(b)) rewritten += 1
      val (na, ha) = digest(a)
      val (nb, hb) = digest(b)
      if (na != nb || ha != hb)
        failures += s"#$i rows $na vs $nb hash ${ha.take(8)} vs ${hb.take(8)}\n$sql"
    }
    assert(failures.isEmpty, s"${failures.length} parity failures:\n${failures.mkString("\n---\n")}")
    // Vacuity guard: the tuned optimizer must actually have CHANGED a
    // meaningful share of the plans, or this suite tested nothing.
    assert(rewritten >= 10, s"only $rewritten/300 plans diverged — the late rules stopped firing")
  }
}
