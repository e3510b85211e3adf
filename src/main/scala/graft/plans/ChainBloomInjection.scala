package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, AttributeReference, BloomFilterMightContain, EqualTo,
  Expression, IsNotNull, Literal, ScalarSubquery, XxHash64
}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, BloomFilterAggregate, Complete
}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Filter, Join, LeafNode, LogicalPlan, Project
}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/**
 * Runtime bloom injection for JOIN-SHAPED creation sides — the case Spark's
 * own `InjectRuntimeFilter` can never fire on.
 *
 * The reference engine pushes build-side join filters into probe scans
 * unconditionally (Trino: dynamic filtering); Spark's rule gates the
 * creation side on `plan.stats.sizeInBytes < creationSideThreshold`, and
 * the stats-only size visitor MULTIPLIES child sizes at every join — so a
 * star-join chain like q5's `customer ⋈ nation ⋈ region(ASIA)` is estimated
 * at petabytes and rejected, even though its OUTPUT is a fifth of customer.
 * The result at sf30: a 180M-row lineitem scan shuffles 4-6GB into a join
 * whose other side was already reduced 80-95% by dimension filters
 * (q3/q5/tq13 were the standing >5x outliers; plans audited "clean" because
 * every operator was individually right — the missing piece was sideways
 * information passing across the join).
 *
 * This rule fires on an Inner equi-join where:
 *   - one side (the FACT) is a bare scan — Projects and IsNotNull-only /
 *     bloom Filters over a leaf — that is non-broadcastable and at least
 *     `applicationSideScanSizeThreshold` big, with no `might_contain`
 *     already keyed on the join key;
 *   - the other side (the CHAIN) contains a Join (a filter-over-scan
 *     creation side is Spark's own territory), is non-broadcastable (a
 *     broadcast chain means no fact shuffle to save), and contains at
 *     least one Filter with a literal predicate beyond IsNotNull — the
 *     selectivity evidence Spark's rule also requires;
 *   - the chain's join-key attribute is traceable to a LEAF RELATION whose
 *     own size is at most 8x `creationSideThreshold`. The leaf that CARRIES
 *     the key bounds the bloom's distinct-item count (joins only ever
 *     remove its keys), so this replaces the useless multiplied-subtree
 *     estimate with a sound one. The 8x headroom admits mid-table carriers
 *     (orders: the q3/q5 lineitem blooms) while still rejecting fact-keyed
 *     creations (lineitem-carried keys) — the shape a measured sf10 A/B
 *     put at +27..59% cost (BASELINE.md round-10 bloom table).
 *
 * It then wraps the fact side in
 *   `Filter(might_contain(scalar-subquery(bloom_agg(xxhash64(chainKey))
 *     over chain), xxhash64(factKey)), fact)`.
 * An OPTIMIZER rule, not a planner strategy: AQE pre-plans the subqueries
 * it finds in the optimized logical plan (`PlanAdaptiveSubqueries` fails on
 * unknown subquery ids), so the ScalarSubquery must exist before planning —
 * a strategy-time injection silently knocked the whole query off the AQE
 * path. The subquery's chain plan is the join's chain side VERBATIM, so
 * under AQE its shuffle stages canonicalize identically to the main plan's
 * and the stage cache executes them once — the marginal cost is the bloom
 * aggregate over the chain's (already reduced) output. Measured same-epoch
 * at sf10 (isolated): q3 15.6->8.6s, q5 15.4->9.0s, tq2 -17%, others flat.
 *
 * Inert outside tuned sessions: with Spark's default
 * `applicationSideScanSizeThreshold` (10GB) nothing qualifies, so Verify /
 * driver correctness runs plan exactly as stock Spark. Kill switch:
 * `spark.graft.chainBlooms=false`.
 */
object InjectChainBlooms extends Rule[LogicalPlan] {

  private def enabled: Boolean = {
    val c = SQLConf.get
    c.getConfString("spark.graft.chainBlooms", "true").toBoolean &&
      c.getConfString("spark.sql.optimizer.runtime.bloomFilter.enabled", "true").toBoolean
  }

  private def bytesConf(key: String, default: Long): Long =
    try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      SQLConf.get.getConfString(key, default.toString + "b"))
    catch { case _: Exception => default }

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

  /** Conjuncts that carry no selectivity evidence. */
  private def boilerplate(c: Expression): Boolean =
    c.isInstanceOf[IsNotNull] || c.isInstanceOf[BloomFilterMightContain]

  /** Bare fact scan: Projects and boilerplate-only Filters over one leaf. */
  private def bareScan(p: LogicalPlan): Boolean = p match {
    case Project(_, child) => bareScan(child)
    case Filter(cond, child) => splitConjuncts(cond).forall(boilerplate) && bareScan(child)
    case _: LeafNode => true
    case _ => false
  }

  /** A literal-bearing data predicate somewhere in the chain — the same
    * selectivity evidence Spark's own injection requires. */
  private def hasSelectiveFilter(p: LogicalPlan): Boolean =
    p.exists {
      case Filter(cond, _) => splitConjuncts(cond).exists(c =>
        !c.isInstanceOf[IsNotNull] && c.exists(_.isInstanceOf[Literal]))
      case _ => false
    }

  /** The leaf relation whose output carries the attribute. */
  private def carrierLeaf(p: LogicalPlan, a: AttributeReference): Option[LeafNode] =
    p.collectFirst { case l: LeafNode if l.outputSet.contains(a) => l }

  private def existingBloomKeys(p: LogicalPlan): Set[Long] =
    p.collect { case Filter(cond, _) => splitConjuncts(cond) }.flatten
      .collect { case m: BloomFilterMightContain =>
        m.valueExpression.references.map(_.exprId.id).toSeq }
      .flatten.toSet

  /** Count of graft-injected blooms already in the subtree. The injected
    * subquery copies the chain VERBATIM (that identity is what lets AQE
    * reuse its stages), so every nested injection doubles the plan-tree
    * walk; unbounded, a deep join chain goes exponential. Two levels cover
    * the star shapes (q5: customer-chain bloom nested inside the
    * orders-chain bloom); deeper nesting is refused. */
  private def graftBloomCount(p: LogicalPlan): Int =
    p.collect { case Filter(cond, _) => splitConjuncts(cond) }.flatten
      .count {
        case m: BloomFilterMightContain => m.bloomFilterExpression match {
          case s: ScalarSubquery => s.plan.output.exists(_.name == "graft_chain_bloom")
          case _ => false
        }
        case _ => false
      }

  /** (factKey, chainKey) for the first usable equi pair. */
  private def pick(
      cond: Expression, left: LogicalPlan, right: LogicalPlan,
      factLeft: Boolean): Option[(AttributeReference, AttributeReference)] = {
    val (fact, chain) = if (factLeft) (left, right) else (right, left)
    val factIds = fact.outputSet
    val chainIds = chain.outputSet
    splitConjuncts(cond).collectFirst {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if factIds.contains(a) && chainIds.contains(b) => (a, b)
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if factIds.contains(b) && chainIds.contains(a) => (b, a)
    }
  }

  def apply(plan: LogicalPlan): LogicalPlan = if (!enabled) plan else {
    val appThreshold = bytesConf(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      10L * 1024 * 1024 * 1024)
    val creationThreshold = bytesConf(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      10L * 1024 * 1024)
    val items = SQLConf.get.getConfString(
      "spark.sql.optimizer.runtime.bloomFilter.expectedNumItems", "1000000").toLong
    val bits = SQLConf.get.getConfString(
      "spark.sql.optimizer.runtime.bloomFilter.numBits", "8388608").toLong

    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        def qualifies(factLeft: Boolean): Option[Join] = {
          val (fact, chain) = if (factLeft) (left, right) else (right, left)
          if (!bareScan(fact) || broadcastable(fact) ||
              fact.stats.sizeInBytes < BigInt(appThreshold) ||
              broadcastable(chain) || !chain.exists(_.isInstanceOf[Join]) ||
              !hasSelectiveFilter(chain) || graftBloomCount(chain) >= 2) None
          else pick(cond, left, right, factLeft).flatMap { case (fk, ck) =>
            if (existingBloomKeys(fact).contains(fk.exprId.id)) None
            else carrierLeaf(chain, ck) match {
              case Some(leaf) if leaf.stats.sizeInBytes <= BigInt(8L * creationThreshold) =>
                val bloomAgg = Alias(
                  AggregateExpression(
                    new BloomFilterAggregate(new XxHash64(Seq(ck)),
                      Literal(items), Literal(bits)),
                    Complete, isDistinct = false), "graft_chain_bloom")()
                val sub = Aggregate(Nil, Seq(bloomAgg), Project(Seq(ck), chain))
                val might = BloomFilterMightContain(
                  ScalarSubquery(sub), new XxHash64(Seq(fk)))
                val newFact = Filter(might, fact)
                Some(if (factLeft) j.copy(left = newFact)
                     else j.copy(right = newFact))
              case _ => None
            }
          }
        }
        (qualifies(factLeft = true) orElse qualifies(factLeft = false)).getOrElse(j)
    }
  }
}
