package graft.plans

import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.adaptive.{BroadcastQueryStageExec, LogicalQueryStage}
import org.apache.spark.sql.internal.SQLConf

/**
 * Join-placement repair for EXISTS / NOT EXISTS over big relations.
 *
 * Catalyst pushes correlated-subquery predicates down to the correlated
 * relation's scan, so `RewritePredicateSubquery` materializes the
 * LeftSemi/LeftAnti join at the BOTTOM of the join tree — underneath the
 * selective dimension joins. On the reference's q21 shape (waiting-supplier:
 * triple-lineitem EXISTS/NOT-EXISTS, `tpch.benchmark.in:68-71`) that means
 * both 60M-row self-joins run over the FULL fact table, and only afterwards
 * does a broadcast join with the nation-filtered supplier list drop 96% of
 * the rows that were semi-joined.
 *
 * A vectorized single-node engine hides this behind fast in-memory hash
 * probes; at shuffle scale the placement dominates. This strategy pulls a
 * chain of LeftSemi/LeftAnti joins (whose build sides are too big to
 * broadcast) ABOVE an adjacent Inner join whose other side IS
 * broadcast-sized, so the cheap map-side dimension filter runs first:
 *
 *   Join(Inner, SemiChain(a), c)  ==>  SemiChain(Join(Inner, a, c))
 *
 * The rewrite is semantics-preserving unconditionally: a semi/anti join
 * only filters its left side's rows (output = left.output), so it commutes
 * with any join above whose condition doesn't reference the semi's build
 * side. It is a HEURISTIC win when `c` is broadcast-sized (the inner join
 * costs one map-side probe and is typically FK->PK non-expanding) and the
 * semi build side is shuffle-sized (its left-side volume sets the sort /
 * build cost). Both gates are checked on logical stats.
 *
 * Implemented as a planner strategy, not an optimizer rule: semi/anti joins
 * from EXISTS only exist after `RewriteSubquery`, which runs after every
 * batch an injected optimizer rule can reach — the planner is the first
 * extension point that sees them. The strategy returns `planLater` on the
 * rewritten logical plan, handing the reshaped tree back to the normal
 * join-selection strategies. Measured (isolated sf10, local[4]): tq21
 * 38.0s -> see BASELINE.md round-10 table.
 */
object PullUpSemiAntiJoins extends SparkStrategy {

  /** Broadcast-sized under either the static or the AQE threshold — AQE
    * will convert a shuffle join to broadcast at runtime from accurate
    * sizes, so planning-time placement may assume the larger bound.
    *
    * Stickiness across AQE replans: once a subtree has materialized as a
    * broadcast stage it IS broadcast — its stats now report the in-memory
    * HashedRelation size (an order of magnitude above the serialized size
    * the threshold was tuned for), and re-evaluating the gate against that
    * would undo the rewrite mid-flight and restructure a running query. */
  private def broadcastable(p: LogicalPlan): Boolean = p match {
    case lqs: LogicalQueryStage =>
      lqs.physicalPlan.collectFirst { case b: BroadcastQueryStageExec => b }.isDefined
    case _ =>
      val conf = SQLConf.get
      val thr = math.max(
        conf.autoBroadcastJoinThreshold,
        conf.getConf(SQLConf.ADAPTIVE_AUTO_BROADCASTJOIN_THRESHOLD).getOrElse(-1L))
      thr > 0 && p.stats.sizeInBytes <= BigInt(thr)
  }

  /** An aggregated build side (IN over GROUP BY ... HAVING, q18/q20 shape)
    * is a DISTINCT-KEY LIST — typically orders of magnitude more selective
    * than a dimension join, so delaying it loses (measured: tq18 +8% when
    * pulled). An EXISTS-over-scan build (q21 shape) filters weakly and is
    * worth delaying past a broadcast dim filter. */
  private def selectiveBuild(r: LogicalPlan): Boolean =
    r.exists(_.isInstanceOf[Aggregate])

  /** Peel a chain of LeftSemi/LeftAnti joins with non-broadcastable,
    * non-aggregated build sides, outermost first, returning the base plan
    * underneath. */
  private def peel(p: LogicalPlan): (LogicalPlan, List[Join]) = p match {
    case j @ Join(l, r, LeftSemi | LeftAnti, _, _)
        if !broadcastable(r) && !selectiveBuild(r) =>
      val (base, chain) = peel(l)
      (base, j :: chain)
    case other => (other, Nil)
  }

  /** Column-pruning Projects (attribute-only) between the inner join and the
    * chain are peeled too; anything computed (aliases) stays put because the
    * join condition above may reference it. */
  private def peelProject(p: LogicalPlan): (LogicalPlan, Option[Project]) = p match {
    case pr @ Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      (child, Some(pr))
    case other => (other, None)
  }

  private def rebuild(chain: List[Join], base: LogicalPlan): LogicalPlan =
    chain.foldRight(base)((semi, acc) => semi.copy(left = acc))

  /** Conf gate (default on) — lets a bench A/B or a user disable the
    * rewrite without rebuilding the session extensions. */
  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.pullUpSemiAntiJoins", "true").toBoolean

  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    // The stage guard is a FULL-subtree check, not just the stickiness in
    // broadcastable(): during an AQE replan the logical tree embeds
    // materialized LogicalQueryStages, and restructuring around them can
    // hand LogicalQueryStageStrategy a broadcast stage on the LEFT of a
    // semi/anti join — that strategy picks the build side purely by which
    // side IS the broadcast stage, and BuildLeft is illegal for semi/anti
    // ("HashJoin should not take LeftAnti ... building left side", hit on
    // the dm fixtures' delete-apply anti joins). The initial plan — where
    // every measured win comes from — has no stages; replans keep the
    // placement the initial plan chose.
    case j @ Join(left, right, Inner, _, _)
        if enabled && !j.exists(_.isInstanceOf[LogicalQueryStage]) =>
      val (lInner, lProj) = peelProject(left)
      val (rInner, rProj) = peelProject(right)
      val (lBase, lChain) = peel(lInner)
      val (rBase, rChain) = peel(rInner)
      if (lChain.nonEmpty && broadcastable(right)) {
        // The pruning Project moves to the TOP of the rebuilt tree (widened
        // by the other side's columns): kept below the inner join it could
        // prune attributes the semi/anti conditions still reference. The
        // join's own condition is attribute-only through the peeled Project,
        // so it resolves against the unprojected base.
        val inner = j.copy(left = lBase)
        val rebuilt = rebuild(lChain, inner)
        val top = lProj.fold(rebuilt)(p =>
          Project(p.projectList ++ right.output, rebuilt))
        Seq(planLater(top))
      } else if (rChain.nonEmpty && broadcastable(left)) {
        val inner = j.copy(right = rBase)
        val rebuilt = rebuild(rChain, inner)
        val top = rProj.fold(rebuilt)(p =>
          Project(left.output ++ p.projectList, rebuilt))
        Seq(planLater(top))
      } else Nil
    case _ => Nil
  }
}
