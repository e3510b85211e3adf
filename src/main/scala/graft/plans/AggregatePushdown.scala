package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, AttributeReference, Cast, Coalesce, EqualTo, Expression,
  Literal, NamedExpression
}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Count, Max, Min, Sum
}
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Filter, Join, LogicalPlan, Project
}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{
  ByteType, DataType, DecimalType, IntegerType, LongType, ShortType
}

/**
 * Eager aggregation below a left-outer join (Yan & Larson, "Eager
 * Aggregation and Lazy Aggregation", VLDB 1995) — the reference's q13
 * shape (`benchmark/tpch/sf=1`, custdist):
 *
 * {{{
 *   SELECT c_custkey, count(o_orderkey) AS c_count
 *   FROM customer LEFT OUTER JOIN orders
 *     ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
 *   GROUP BY c_custkey
 * }}}
 *
 * Spark shuffles the FULL orders row stream into the join only for the
 * aggregate above it to collapse everything per customer. When every
 * aggregate function reads only right-side columns and the grouping reads
 * only left-side columns, the aggregation can run below the join instead:
 *
 *   - the right side becomes `Aggregate(r.k)(partials)` over the
 *     right-only join conjuncts (map-side partial combine shrinks the
 *     shuffle to one row per key, and the aggregated side is usually
 *     small enough for AQE to broadcast — removing the probe-side
 *     shuffle too);
 *   - the join keeps only the equality conjunct;
 *   - each outer aggregate recombines the carried partial.
 *
 * SOUNDNESS (unconditional — no key-uniqueness assumption on either
 * side). Fix an output group G (grouping reads only the left side) and a
 * left row ℓ in it with join key k matching m_ℓ right rows after the
 * right-only conjuncts (m_ℓ = 0 → one null-extended row). Per function:
 *
 *   - `count(r.x)`: original contributes Σ_ℓ c_k(x) where c_k is the
 *     per-key non-null count (0 when unmatched). Rewritten, ℓ carries
 *     `cnt = c_k` (null when unmatched) and the outer
 *     `sum(coalesce(cnt, 0))` restores exactly Σ_ℓ c_k. Groups are never
 *     empty, so the coalesced sum is never null — matching count's
 *     non-null contract.
 *   - `count(*)`: unmatched ℓ contributes its null-extended row, so the
 *     outer side is `sum(coalesce(cnt, 1))`.
 *   - `sum(r.x)`: per-key sum S_k carried; `cast(sum(S_k) AS <orig>)`
 *     re-adds one S_k per left duplicate — the same multiset total the
 *     raw join produced. Null-complete: S_k is null iff every matched x
 *     is null, exactly when those rows contribute nothing originally;
 *     an all-unmatched group yields null on both sides. Restricted to
 *     EXACT numeric types (integral/decimal) so the regrouped addition
 *     can never perturb a float result; the cast undoes sum's decimal
 *     widening so the output attribute keeps its analyzed type.
 *   - `min/max(r.x)`: min of per-key mins over the group's keys equals
 *     the min over the raw multiset; null-extended rows carry null,
 *     which min/max ignore — as they ignored the absence of rows.
 *
 * Right rows with a NULL join key collapse into the pre-aggregate's null
 * group, which the equality join never matches — exactly the rows the
 * original join never matched. Conjuncts referencing only the LEFT side
 * stay in the join condition (left rows failing them null-extend, before
 * and after). Any other conjunct shape (non-equi cross-side) refuses.
 *
 * Perf-targeted like the other late rules: registered in
 * [[graft.BenchSession.session]] (oracled there via `SPARK_GRAFT_TUNED=1`
 * Verify runs), killable via `spark.graft.aggregatePushdown=false`.
 * Measured at sf10: tq13 4.9 s → see BASELINE.md A/B.
 */
object PushAggThroughOuterJoin extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.aggregatePushdown", "true").toBoolean

  private def exactNumeric(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | _: DecimalType => true
    case _ => false
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  def apply(plan: LogicalPlan): LogicalPlan = if (!enabled) plan else {
    plan.transformUp {
      case agg @ Aggregate(groups, aggExprs, child, _) =>
        rewrite(groups, aggExprs, child).getOrElse(agg)
    }
  }

  private def rewrite(groups: Seq[Expression], aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    // Optionally one attribute-only Project (column pruning) above the join.
    val (proj, join) = child match {
      case p @ Project(l, j: Join) if l.forall(_.isInstanceOf[AttributeReference]) =>
        (Some(p), j)
      case j: Join => (None, j)
      case _ => return None
    }
    if (join.joinType != LeftOuter) return None
    val conjuncts = join.condition.map(splitConjuncts).getOrElse(return None)

    // Exactly one cross-side equality; all other conjuncts single-sided.
    val (equis, rest) = conjuncts.partition {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        (join.left.outputSet.contains(a) && join.right.outputSet.contains(b)) ||
          (join.left.outputSet.contains(b) && join.right.outputSet.contains(a))
      case _ => false
    }
    val (lk, rk) = equis match {
      case Seq(EqualTo(a: AttributeReference, b: AttributeReference)) =>
        if (join.left.outputSet.contains(a)) (a, b) else (b, a)
      case _ => return None
    }
    // Idempotence: the rule's own output (or an equivalent pre-grouped
    // input) has the right side already aggregated by the join key —
    // re-firing in the fixed-point batch would nest one aggregate per
    // iteration (and drop the count fallback on the way).
    join.right match {
      case Aggregate(Seq(g: AttributeReference), _, _, _) if g.exprId == rk.exprId =>
        return None
      case _ => ()
    }

    val (rightOnly, leftOnly) = rest.partition(_.references.subsetOf(join.right.outputSet))
    if (!leftOnly.forall(_.references.subsetOf(join.left.outputSet))) return None
    if (rest.exists(!_.deterministic)) return None

    // Grouping and non-aggregate output read only the left side; every
    // aggregate function reads only the right side.
    if (groups.exists(_.references.exists(join.right.outputSet.contains))) return None
    val aggFns = aggExprs.flatMap(_.collect { case ae: AggregateExpression => ae })
    if (aggFns.isEmpty) return None
    val marker = AttributeReference("_graft_marker", LongType)()
    val nonAggRefs = aggExprs.flatMap(e =>
      e.transform { case _: AggregateExpression => marker }.references)
    if (nonAggRefs.exists(join.right.outputSet.contains)) return None

    // One carried partial per distinct supported aggregate; anything
    // unsupported refuses the whole rewrite.
    val partials = scala.collection.mutable.LinkedHashMap.empty[Expression, Alias]
    def partialFor(ae: AggregateExpression): Option[Alias] = {
      val supported = ae match {
        case AggregateExpression(fn, _, false, None, _) => fn match {
          case Count(Seq(x)) =>
            x.references.isEmpty || x.references.subsetOf(join.right.outputSet)
          case Sum(x, _) =>
            x.references.nonEmpty && x.references.subsetOf(join.right.outputSet) &&
              exactNumeric(x.dataType)
          case Min(x) => x.references.nonEmpty && x.references.subsetOf(join.right.outputSet)
          case Max(x) => x.references.nonEmpty && x.references.subsetOf(join.right.outputSet)
          case _ => false
        }
        case _ => false
      }
      if (!supported) None
      else Some(partials.getOrElseUpdate(ae.aggregateFunction.canonicalized, {
        Alias(AggregateExpression(ae.aggregateFunction, Complete, isDistinct = false),
          s"graft_push_${partials.size}")()
      }))
    }
    val byFn: Map[AggregateExpression, Alias] =
      aggFns.map(ae => ae -> (partialFor(ae).getOrElse(return None))).toMap

    // Pre-aggregate the right side under its own conjuncts, keyed on rk.
    val preChild = rightOnly match {
      case Seq() => join.right
      case cs => Filter(cs.reduce(And), join.right)
    }
    val preAgg = Aggregate(Seq(rk), Seq(rk) ++ partials.values.toSeq, preChild)
    val newCond = (Seq(EqualTo(lk, rk)) ++ leftOnly).reduce(And)
    val newJoin = Join(join.left, preAgg, LeftOuter, Some(newCond), join.hint)
    // The left-outer join null-extends the carried partials: reference
    // them as nullable above it (a stale non-nullable attribute would let
    // codegen skip the null check on an actually-null slot).
    val carried = partials.values.map(_.toAttribute.withNullability(true)).toSeq
    val newChild = proj match {
      case Some(p) =>
        val kept = p.projectList.collect {
          case x: AttributeReference if !join.right.outputSet.contains(x) => x
        }
        Project((kept ++ carried).distinct, newJoin)
      case None => newJoin
    }

    // Recombine each aggregate over its carried partial.
    val newAggExprs = aggExprs.map(_.transform {
      case ae: AggregateExpression =>
        val c = byFn(ae).toAttribute.withNullability(true)
        ae.aggregateFunction match {
          case Count(Seq(x)) =>
            val fallback = Literal(if (x.references.isEmpty) 1L else 0L)
            AggregateExpression(Sum(Coalesce(Seq(c, fallback))), ae.mode, isDistinct = false)
          case s: Sum =>
            val resummed = AggregateExpression(s.copy(child = c), ae.mode, isDistinct = false)
            if (resummed.dataType == ae.dataType) resummed else Cast(resummed, ae.dataType)
          case _: Min => AggregateExpression(Min(c), ae.mode, isDistinct = false)
          case _: Max => AggregateExpression(Max(c), ae.mode, isDistinct = false)
        }
    }.asInstanceOf[NamedExpression])
    Some(Aggregate(groups, newAggExprs, newChild))
  }
}
