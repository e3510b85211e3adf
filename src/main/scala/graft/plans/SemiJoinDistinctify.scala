package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, Attribute, AttributeReference, EqualNullSafe, EqualTo,
  Expression, GetStructField, GreaterThan, GreaterThanOrEqual, If,
  IsNotNull, LessThan, LessThanOrEqual, Not, Or
}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Max, Min
}
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Filter, Join, LeafNode, LogicalPlan, Project
}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.adaptive.LogicalQueryStage
import org.apache.spark.sql.internal.SQLConf

/**
 * Build-side reduction for shuffle-sized semi/anti joins.
 *
 * A LeftSemi/LeftAnti join asks an EXISTENCE question, yet Spark shuffles
 * the build side's full row stream. When the build side is a fact table
 * (the reference's q21 waiting-supplier EXISTS/NOT-EXISTS self-joins over
 * lineitem, `tpch.benchmark.in:68-71`; q4's EXISTS; bare NOT-EXISTS probes),
 * that is tens of millions of rows hashed across the wire to answer a
 * question whose support is the DISTINCT KEY SET — an order of magnitude
 * smaller. This strategy rewrites the build side into an Aggregate so that
 * map-side partial aggregation collapses duplicate keys BEFORE the shuffle,
 * and the shrunken build frequently becomes broadcast-sized at runtime (AQE
 * then removes the probe-side shuffle entirely).
 *
 * Four condition shapes are handled; anything else is left untouched:
 *
 *  1. PURE EQUALITY — every conjunct is `l.x = r.y` (or `<=>`):
 *       Join(semi/anti, l, r, keys)  ==>  Join(semi/anti, l, Agg(keys)(r), keys)
 *     Deduplication cannot change an existence answer, and grouping
 *     preserves the attribute ids of the keys so the condition rebinds
 *     as-is. (`<=>` groups nulls into one group, which is exactly the
 *     group `<=>` matches; `=` never matches the null group — harmless.)
 *
 *  2. EQUALITY + ONE INEQUALITY `l.a <> r.b` (the q21 correlation
 *     `l2.l_suppkey <> l1.l_suppkey`):
 *       r  ==>  Agg(keys)(lo = min(b), hi = max(b))
 *       cond ==> keys-equal AND isnotnull(l.a) AND (lo <> l.a OR hi <> l.a)
 *     (min/max — NOT count(DISTINCT b), which physical-plans with a second
 *     shuffle round over near-unique (key, b) pairs and would keep the
 *     full build volume on the wire; min/max combine map-side.)
 *     Proof of equivalence of the existence answer, per key-matched group
 *     (min/max ignore NULL b values — precisely the rows `b <> a` can
 *     never be satisfied by):
 *       - two or more distinct non-null b values: lo < hi, and a non-null
 *         l.a can equal at most one of them, so the OR is true — and
 *         indeed some b <> a exists. Correct.
 *       - exactly one distinct non-null b: lo = hi = b; the OR reduces to
 *         b <> a. Correct.
 *       - no non-null b: lo and hi are NULL, the OR is NULL, and the join
 *         treats a NULL condition as no-match — as does EXISTS. Correct.
 *       - l.a NULL: `b <> a` is never true regardless of b, but lo < hi
 *         alone would claim a match — hence the isnotnull(l.a) guard.
 *     The same logic holds verbatim under LeftAnti because anti = "exists
 *     is false", and the rewritten condition's truth value equals the
 *     original existence answer row-for-row (NULL folding to no-match on
 *     both sides).
 *
 *  3. EQUALITY + ONE RANGE `r.d OP l.c` (the q4 EXISTS correlation
 *     `l_shipdate > o_orderdate`):
 *       r  ==>  Agg(keys)(m = max(d))        [min when OP keeps smaller d]
 *       cond ==> keys-equal AND m OP l.c
 *     Some build row's d satisfies the comparison iff the group extreme
 *     does; Min/Max skip NULL d and an all-NULL group's NULL extreme
 *     compares to NULL = no-match, matching EXISTS exactly.
 *
 *  4. EQUALITY + `l.a <> r.b` + `r.d OP l.c` (the q21 NOT-EXISTS
 *     correlation `l3.l_suppkey <> l1.l_suppkey AND l3.l_shipdate >
 *     l1.l_shipdate`):
 *       r  ==>  Agg(keys)(t2 = top_two_distinct_extreme(b, d))
 *       cond ==> keys-equal AND isnotnull(l.a)
 *                AND (if (l.a = t2.s1) t2.d2 else t2.d1) OP l.c
 *     With f(x) = ext{d : b <> x}, existence per matched group is
 *     `f(l.a) OP l.c`; [[TopTwoDistinctExtreme]]'s scaladoc carries the
 *     proof that (s1, d1, d2) computes f exactly, ties included. A <> or
 *     range conjunct whose build attr is itself a join key needs no
 *     aggregate at all: it is constant per group and passes through.
 *
 * Gates: the build side must not be broadcastable (a broadcast build costs
 * no shuffle, and the hash table dedups for free), must not already be an
 * Aggregate/Distinct (q18's IN-over-GROUP-BY build is already key-level),
 * must not be a materialized AQE query stage (re-planning must not stack a
 * second aggregate onto a finished stage) — and must be a BARE scan:
 * nothing but Projects and IsNotNull-only Filters (which Catalyst itself
 * derives from the join keys) above the leaf. An unfiltered fact-table
 * build dedups at rows/NDV(key) — 60M lineitem rows to 2M part keys on the
 * bare NOT-EXISTS probe, measured 12.4s -> 3.0s at sf10 because the
 * shrunken build goes broadcast and the probe-side shuffle disappears —
 * while a data-filtered build has already passed a selectivity the planner
 * cannot estimate without CBO stats, and the q_semi A/B (l_quantity > 45:
 * 6M rows to 4.3M keys, a 1.4:1 ratio) measured the aggregation pass as a
 * +19% net loss. Erring on the bare-scan side keeps every measured win
 * and forfeits only unknowable ones.
 *
 * Planner strategy, not optimizer rule, for the same reason as
 * [[PullUpSemiAntiJoins]]: these joins only exist after RewriteSubquery.
 * The two strategies compose: PullUpSemiAntiJoins fires at the inner join
 * above, and this one fires when the planner recurses into each semi/anti
 * node via planLater. Measured (isolated sf10, local[4]): see BASELINE.md
 * round-10 table.
 */
object DistinctifySemiAntiBuilds extends SparkStrategy {

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.distinctifySemiAntiBuilds", "true").toBoolean

  /** Same logical-stats broadcast gate as [[PullUpSemiAntiJoins]]. */
  private def broadcastable(p: LogicalPlan): Boolean = {
    val conf = SQLConf.get
    val thr = math.max(
      conf.autoBroadcastJoinThreshold,
      conf.getConf(SQLConf.ADAPTIVE_AUTO_BROADCASTJOIN_THRESHOLD).getOrElse(-1L))
    thr > 0 && p.stats.sizeInBytes <= BigInt(thr)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** Projects, IsNotNull-only Filters and row-preserving deserialization
    * above a leaf — i.e. no data predicate has reduced the build below its
    * full-table key profile. Injected runtime bloom filters
    * (`might_contain` over a join key) are also admitted: a key-aligned
    * bloom removes WHOLE key groups (every row of a key survives or none
    * does, modulo false positives that keep extra groups), so the per-key
    * duplication ratio the rewrite's payoff rests on is unchanged — unlike
    * a data predicate, which thins groups to near 1:1 (the measured q_semi
    * +19% loss). Semantics are unaffected either way: the Aggregate is
    * stacked over the same filtered child the join would scan. */
  private def bareBuild(p: LogicalPlan): Boolean = p match {
    case Project(_, child) => bareBuild(child)
    case Filter(cond, child) =>
      splitConjuncts(cond).forall(c =>
        c.isInstanceOf[IsNotNull] ||
          c.isInstanceOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]) &&
        bareBuild(child)
    case s: org.apache.spark.sql.catalyst.plans.logical.SerializeFromObject =>
      bareBuild(s.child)
    case _: LeafNode => true
    case _ => false
  }

  /** One `build.d OP probe.d` range conjunct, orientation-normalized:
    * `descending` = the existence answer needs the build-side MAX (OP keeps
    * larger build values matching); `rebuild` re-emits the original
    * comparison with an aggregate of `rd` substituted for `rd`. */
  private case class RangeConj(
      orig: Expression, ld: Attribute, rd: Attribute,
      descending: Boolean, rebuild: Expression => Expression)

  /** Decompose the join condition into key equalities (left-attr, right-attr)
    * plus at most one `l.a <> r.b` and at most one range comparison
    * `r.d OP l.c`. Returns None when any conjunct falls outside those
    * shapes (expressions, r-only predicates that survived pushdown,
    * multiple inequalities of a kind, ...). */
  private def classify(cond: Expression, leftOut: Seq[Attribute], rightOut: Seq[Attribute])
      : Option[(Seq[(Expression, Attribute, Attribute)], Option[(Expression, Attribute, Attribute)],
          Option[RangeConj])] = {
    val leftIds = leftOut.map(_.exprId).toSet
    val rightIds = rightOut.map(_.exprId).toSet
    def side(a: Attribute): Int =
      if (leftIds.contains(a.exprId)) 0 else if (rightIds.contains(a.exprId)) 1 else -1
    var equis = Vector.empty[(Expression, Attribute, Attribute)] // (orig, l key, r key)
    var neq: Option[(Expression, Attribute, Attribute)] = None // (orig, l.a, r.b)
    var range: Option[RangeConj] = None
    splitConjuncts(cond).foreach {
      case eq @ EqualTo(a: AttributeReference, b: AttributeReference)
          if side(a) == 0 && side(b) == 1 => equis :+= (eq, a, b)
      case eq @ EqualTo(a: AttributeReference, b: AttributeReference)
          if side(a) == 1 && side(b) == 0 => equis :+= (eq, b, a)
      case eq @ EqualNullSafe(a: AttributeReference, b: AttributeReference)
          if side(a) == 0 && side(b) == 1 => equis :+= (eq, a, b)
      case eq @ EqualNullSafe(a: AttributeReference, b: AttributeReference)
          if side(a) == 1 && side(b) == 0 => equis :+= (eq, b, a)
      case ne @ Not(EqualTo(a: AttributeReference, b: AttributeReference))
          if side(a) == 0 && side(b) == 1 && neq.isEmpty => neq = Some((ne, a, b))
      case ne @ Not(EqualTo(a: AttributeReference, b: AttributeReference))
          if side(a) == 1 && side(b) == 0 && neq.isEmpty => neq = Some((ne, b, a))
      // Range conjuncts, both operand orders. The existence answer over a
      // key group needs max(rd) when larger rd values match (rd > c,
      // rd >= c), min(rd) otherwise.
      case r @ GreaterThan(a: AttributeReference, b: AttributeReference)
          if side(a) == 1 && side(b) == 0 && range.isEmpty =>
        range = Some(RangeConj(r, b, a, descending = true, m => GreaterThan(m, b)))
      case r @ GreaterThanOrEqual(a: AttributeReference, b: AttributeReference)
          if side(a) == 1 && side(b) == 0 && range.isEmpty =>
        range = Some(RangeConj(r, b, a, descending = true, m => GreaterThanOrEqual(m, b)))
      case r @ LessThan(a: AttributeReference, b: AttributeReference)
          if side(a) == 1 && side(b) == 0 && range.isEmpty =>
        range = Some(RangeConj(r, b, a, descending = false, m => LessThan(m, b)))
      case r @ LessThanOrEqual(a: AttributeReference, b: AttributeReference)
          if side(a) == 1 && side(b) == 0 && range.isEmpty =>
        range = Some(RangeConj(r, b, a, descending = false, m => LessThanOrEqual(m, b)))
      case r @ GreaterThan(a: AttributeReference, b: AttributeReference)
          if side(a) == 0 && side(b) == 1 && range.isEmpty =>
        range = Some(RangeConj(r, a, b, descending = false, m => GreaterThan(a, m)))
      case r @ GreaterThanOrEqual(a: AttributeReference, b: AttributeReference)
          if side(a) == 0 && side(b) == 1 && range.isEmpty =>
        range = Some(RangeConj(r, a, b, descending = false, m => GreaterThanOrEqual(a, m)))
      case r @ LessThan(a: AttributeReference, b: AttributeReference)
          if side(a) == 0 && side(b) == 1 && range.isEmpty =>
        range = Some(RangeConj(r, a, b, descending = true, m => LessThan(a, m)))
      case r @ LessThanOrEqual(a: AttributeReference, b: AttributeReference)
          if side(a) == 0 && side(b) == 1 && range.isEmpty =>
        range = Some(RangeConj(r, a, b, descending = true, m => LessThanOrEqual(a, m)))
      case _ => return None
    }
    if (equis.isEmpty) None else Some((equis, neq, range))
  }

  /** Probe-side runtime bloom filters re-aimed (via the equi pairs) at the
    * build. A build row whose key misses the probe's bloom can never change
    * an existence answer — its group equi-matches no probe row — so the
    * SAME bloom prunes the build BEFORE the aggregate. This is sideways
    * information passing the optimizer cannot do itself: InjectRuntimeFilter
    * ran before this strategy created the aggregate, and it had already
    * rejected the raw fact build as an application side. Soundness of the
    * substitution: a non-null probe key value at this join necessarily
    * flowed through the probe-side Filter that carries the bloom (attribute
    * ids are unique and values pass through unchanged), so every key the
    * join could match is bloom-positive; NULL probe keys never equi-match.
    * The physical subquery driving both filters deduplicates via
    * ReuseSubquery/AQE subquery reuse. */
  private def cloneProbeBlooms(
      left: LogicalPlan, right: LogicalPlan,
      equis: Seq[(Expression, Attribute, Attribute)]): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    val byLeftId = equis.map(e => e._2.exprId -> e._3).toMap
    // Collect blooms ONLY along a value-preserving path from the probe root:
    // the soundness argument above needs every non-null probe key value to
    // have flowed through the Filter that carries the bloom. Project/Filter
    // pass values through; a Join's output values all come from one of its
    // children (preserved sides verbatim, outer sides null-padded — and NULL
    // keys never equi-match), so recursing into join children is safe. A
    // blanket subtree collect was NOT: Union and Expand reuse their FIRST
    // child's exprIds for output, so a bloom inside one Union branch matches
    // the join-key exprId while rows from the other branches bypassed it —
    // the cloned bloom would prune build key groups those rows legitimately
    // match (missing rows on LeftSemi, spurious ones on LeftAnti). Stop at
    // Union/Expand/anything else that can emit exprId-aliased values.
    def blooms(p: LogicalPlan): Seq[BloomFilterMightContain] = p match {
      case Filter(c, child) =>
        splitConjuncts(c).collect { case m: BloomFilterMightContain => m } ++ blooms(child)
      case Project(_, child) => blooms(child)
      case j: Join => j.children.flatMap(blooms)
      case s: org.apache.spark.sql.catalyst.plans.logical.SerializeFromObject =>
        blooms(s.child)
      case _ => Nil
    }
    val existing = blooms(right).map(_.canonicalized).toSet
    val cloned = blooms(left).flatMap { m =>
      m.valueExpression.references.toSeq match {
        case Seq(a) if byLeftId.contains(a.exprId) &&
            byLeftId(a.exprId).dataType == a.dataType =>
          val sub = m.valueExpression.transform {
            case ar: AttributeReference if ar.exprId == a.exprId => byLeftId(a.exprId)
          }
          Some(m.withNewChildren(Seq(m.bloomFilterExpression, sub))
            .asInstanceOf[BloomFilterMightContain])
        case _ => None
      }
    }.filterNot(m => existing.contains(m.canonicalized))
      .groupBy(_.canonicalized).map(_._2.head).toSeq
    if (cloned.isEmpty) right
    else Filter(cloned.map(_.asInstanceOf[Expression]).reduce(And), right)
  }

  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j @ Join(left, right, LeftSemi | LeftAnti, Some(cond), _)
        if enabled && !broadcastable(right) && bareBuild(right) &&
          !right.exists(p => p.isInstanceOf[Aggregate] || p.isInstanceOf[LogicalQueryStage]) =>
      classify(cond, left.output, right.output) match {
        case Some((equis, neqOpt, rangeOpt)) =>
          val keys = equis.map(_._3).distinct
          val prunedRight = cloneProbeBlooms(left, right, equis)
          val keyIds = keys.map(_.exprId).toSet
          // A <>/range conjunct whose BUILD attr is itself a join key is
          // constant per group: grouping keeps it, the original conjunct
          // rebinds as-is, and no aggregate of it is needed.
          val keyConjs =
            neqOpt.filter(n => keyIds.contains(n._3.exprId)).map(_._1).toSeq ++
            rangeOpt.filter(r => keyIds.contains(r.rd.exprId)).map(_.orig).toSeq
          val neq = neqOpt.filterNot(n => keyIds.contains(n._3.exprId))
          val range = rangeOpt.filterNot(r => keyIds.contains(r.rd.exprId))
          val passthrough = equis.map(_._1) ++ keyConjs
          (neq, range) match {
            case (None, None) =>
              // Pure equality (possibly plus key-constant extras): the
              // build side needs only its distinct key tuples. Without
              // stats assume fact tables repeat keys — the partial agg is
              // map-side and cheap.
              val agg = Aggregate(keys, keys, prunedRight)
              Seq(planLater(j.copy(right = agg)))
            case (Some((_, la, rb)), None) =>
              val loAlias = Alias(
                AggregateExpression(Min(rb), Complete, isDistinct = false), "graft_lo")()
              val hiAlias = Alias(
                AggregateExpression(Max(rb), Complete, isDistinct = false), "graft_hi")()
              val agg = Aggregate(keys, keys ++ Seq(loAlias, hiAlias), prunedRight)
              val residual = And(
                IsNotNull(la),
                Or(
                  Not(EqualTo(loAlias.toAttribute, la)),
                  Not(EqualTo(hiAlias.toAttribute, la))))
              val newCond = (passthrough :+ residual).reduce(And)
              Seq(planLater(j.copy(right = agg, condition = Some(newCond))))
            case (None, Some(rc)) =>
              // Range-only correlation (the reference's q4 EXISTS shape,
              // `l_orderkey = o_orderkey AND l_shipdate > o_orderdate`):
              // some build d matches iff the group extreme does. Min/Max
              // skip NULL d, and an all-NULL group yields a NULL extreme
              // whose comparison is NULL = no-match — exactly the
              // original answer, for semi and anti alike.
              val fn = if (rc.descending) Max(rc.rd) else Min(rc.rd)
              val mAlias = Alias(
                AggregateExpression(fn, Complete, isDistinct = false), "graft_m")()
              val agg = Aggregate(keys, keys :+ mAlias, prunedRight)
              val newCond = (passthrough :+ rc.rebuild(mAlias.toAttribute)).reduce(And)
              Seq(planLater(j.copy(right = agg, condition = Some(newCond))))
            case (Some((_, la, rb)), Some(rc))
                if UnsafeRow.isMutable(rb.dataType) && UnsafeRow.isMutable(rc.rd.dataType) =>
              // <> plus range (the q21 NOT-EXISTS correlation): with
              // f(x) = ext{d : s <> x}, existence reduces to
              // `f(la) OP ld`. TopTwoDistinctExtreme yields (s1, d1, d2)
              // with f(x) = if (x = s1) d2 else d1 — see its scaladoc for
              // the exactness argument (ties included). NULL folding:
              //   - la NULL: `s <> la` never matches; the IsNotNull guard
              //     forces no-match (without it, `la = s1` would be NULL,
              //     If would take d1, and d1 OP ld could claim a match).
              //   - group rows with NULL s or d are skipped by the
              //     aggregate, as the condition can never select them; a
              //     group of only such rows has d1 NULL, so the
              //     comparison is NULL = no-match, like the original.
              //   - d2 NULL (s1 the only distinct s): probe la = s1
              //     compares against NULL = no-match; the original has
              //     only s1 rows to offer, which `s <> la` rejects.
              // Gated to fixed-length buffer types so the declarative
              // aggregate stays inside codegen'd HashAggregate (var-length
              // buffers would demote it to sort-based aggregation).
              val t2Alias = Alias(
                AggregateExpression(
                  TopTwoDistinctExtreme(rb, rc.rd, rc.descending),
                  Complete, isDistinct = false), "graft_t2")()
              val t2 = t2Alias.toAttribute
              val eff = If(
                EqualTo(GetStructField(t2, 0, Some("s1")), la),
                GetStructField(t2, 2, Some("d2")),
                GetStructField(t2, 1, Some("d1")))
              val agg = Aggregate(keys, keys :+ t2Alias, prunedRight)
              val newCond =
                (passthrough ++ Seq(IsNotNull(la), rc.rebuild(eff))).reduce(And)
              Seq(planLater(j.copy(right = agg, condition = Some(newCond))))
            case _ => Nil
          }
        case None => Nil
      }
    case _ => Nil
  }
}
