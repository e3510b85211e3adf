package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, Attribute, AttributeReference, EqualNullSafe, EqualTo,
  Expression, IsNotNull, Not, Or
}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Max, Min
}
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
 * Two condition shapes are handled; anything else is left untouched:
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

  /** Projects and IsNotNull-only Filters above a leaf — i.e. no data
    * predicate has reduced the build below its full-table key profile. */
  private def bareBuild(p: LogicalPlan): Boolean = p match {
    case Project(_, child) => bareBuild(child)
    case Filter(cond, child) =>
      splitConjuncts(cond).forall(_.isInstanceOf[IsNotNull]) && bareBuild(child)
    case _: LeafNode => true
    case _ => false
  }

  /** Decompose the join condition into key equalities (left-attr, right-attr)
    * plus at most one `l.a <> r.b`. Returns None when any conjunct falls
    * outside those shapes (expressions, r-only predicates that survived
    * pushdown, multiple inequalities, ...). */
  private def classify(cond: Expression, leftOut: Seq[Attribute], rightOut: Seq[Attribute])
      : Option[(Seq[(Expression, Attribute)], Option[(Attribute, Attribute)])] = {
    val leftIds = leftOut.map(_.exprId).toSet
    val rightIds = rightOut.map(_.exprId).toSet
    def side(a: Attribute): Int =
      if (leftIds.contains(a.exprId)) 0 else if (rightIds.contains(a.exprId)) 1 else -1
    var equis = Vector.empty[(Expression, Attribute)] // (original conjunct, r key attr)
    var neq: Option[(Attribute, Attribute)] = None    // (l.a, r.b)
    splitConjuncts(cond).foreach {
      case eq @ EqualTo(a: AttributeReference, b: AttributeReference)
          if side(a) == 0 && side(b) == 1 => equis :+= (eq, b)
      case eq @ EqualTo(a: AttributeReference, b: AttributeReference)
          if side(a) == 1 && side(b) == 0 => equis :+= (eq, a)
      case eq @ EqualNullSafe(a: AttributeReference, b: AttributeReference)
          if side(a) == 0 && side(b) == 1 => equis :+= (eq, b)
      case eq @ EqualNullSafe(a: AttributeReference, b: AttributeReference)
          if side(a) == 1 && side(b) == 0 => equis :+= (eq, a)
      case Not(EqualTo(a: AttributeReference, b: AttributeReference))
          if side(a) == 0 && side(b) == 1 && neq.isEmpty => neq = Some((a, b))
      case Not(EqualTo(a: AttributeReference, b: AttributeReference))
          if side(a) == 1 && side(b) == 0 && neq.isEmpty => neq = Some((b, a))
      case _ => return None
    }
    if (equis.isEmpty) None else Some((equis, neq))
  }

  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j @ Join(left, right, LeftSemi | LeftAnti, Some(cond), _)
        if enabled && !broadcastable(right) && bareBuild(right) &&
          !right.exists(p => p.isInstanceOf[Aggregate] || p.isInstanceOf[LogicalQueryStage]) =>
      classify(cond, left.output, right.output) match {
        case Some((equis, None)) =>
          // Pure equality: build side needs only its distinct key tuples.
          val keys = equis.map(_._2).distinct
          // No reduction possible when the keys ARE the whole build row
          // minus nothing to drop AND unique; without stats assume fact
          // tables repeat keys — the partial agg is map-side and cheap.
          val agg = Aggregate(keys, keys, right)
          Seq(planLater(j.copy(right = agg)))
        case Some((equis, Some((la, rb)))) =>
          val keys = equis.map(_._2).distinct
          if (keys.contains(rb)) {
            // b is itself a key: per group b is constant, dedup suffices
            // and the original condition rebinds against the agg output.
            val agg = Aggregate(keys, keys, right)
            Seq(planLater(j.copy(right = agg)))
          } else {
            val loAlias = Alias(
              AggregateExpression(Min(rb), Complete, isDistinct = false), "graft_lo")()
            val hiAlias = Alias(
              AggregateExpression(Max(rb), Complete, isDistinct = false), "graft_hi")()
            val agg = Aggregate(keys, keys ++ Seq(loAlias, hiAlias), right)
            val residual = And(
              IsNotNull(la),
              Or(
                Not(EqualTo(loAlias.toAttribute, la)),
                Not(EqualTo(hiAlias.toAttribute, la))))
            val newCond = (equis.map(_._1) :+ residual).reduce(And)
            Seq(planLater(j.copy(right = agg, condition = Some(newCond))))
          }
        case None => Nil
      }
    case _ => Nil
  }
}
