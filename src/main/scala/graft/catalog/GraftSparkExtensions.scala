package graft.catalog

import graft.sources.GraftTable
import graft.write.Dml
import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, AttributeSet, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/**
 * SQL row-level DML for graft tables: `spark.sql.extensions=graft.catalog.GraftSparkExtensions`
 * makes `UPDATE` and `MERGE INTO` statements over catalog-resolved graft
 * tables execute through the engine's merge-on-read DML
 * ([[graft.write.Dml.update]] / [[graft.write.Dml.merge]] — positional
 * deletes on v2, deletion vectors on v3, one OVERWRITE snapshot).
 *
 * The reference front-end accepts full SQL DML (src/iceberg_extension.cpp:135-162);
 * Spark-side, tables without `SupportsRowLevelOperations` reject UPDATE/MERGE
 * at analysis, so this extension rewrites the analyzed `UpdateTable` /
 * `MergeIntoTable` nodes into runnable commands before that check fires.
 * DELETE needs no rule — GraftTable implements `SupportsDelete`.
 *
 * The rewrite re-renders analyzed expressions as SQL text (`Expression.sql`)
 * with qualifiers normalized to Dml.merge's `t`/`s` aliases (target/source),
 * so a user's own aliases don't have to match. The full MERGE clause matrix
 * is lowered: multiple conditional WHEN clauses (first-matching-wins), WHEN
 * NOT MATCHED BY SOURCE update/delete, and UPDATE SET * / INSERT *. Still
 * unsupported shapes — nested-field assignment, schema evolution — fail
 * loudly rather than mis-executing.
 */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(_ => GraftDmlRewrite)
    // Join-placement repair for EXISTS/NOT-EXISTS over big relations — a
    // planner strategy because semi/anti joins only materialize after the
    // last injectable optimizer batch (see PullUpSemiAntiJoins scaladoc).
    ext.injectPlannerStrategy(_ => graft.plans.PullUpSemiAntiJoins)
    // Build-side reduction for shuffle-sized semi/anti joins (distinct
    // keys / min-max rewrite); composes with the placement rule through
    // planLater recursion (see DistinctifySemiAntiBuilds scaladoc).
    ext.injectPlannerStrategy(_ => graft.plans.DistinctifySemiAntiBuilds)
    // Runtime blooms for join-shaped creation sides, which Spark's own
    // InjectRuntimeFilter size-estimates to death (see InjectChainBlooms
    // scaladoc). An optimizer rule so AQE's subquery pre-planning sees the
    // injected ScalarSubquery. Inert under stock thresholds.
    ext.injectOptimizerRule(_ => graft.plans.InjectChainBlooms)
  }
}

private[graft] object GraftDmlRewrite extends Rule[LogicalPlan] {

  private def graftTarget(plan: LogicalPlan): Option[(GraftTable, AttributeSet)] = plan match {
    case SubqueryAlias(_, child) => graftTarget(child)
    case r: DataSourceV2Relation => r.table match {
      case g: GraftTable => Some((g, r.outputSet))
      case _ => None
    }
    case _ => None
  }

  /** Render with qualifiers dropped — for UPDATE, whose condition/values
    * re-resolve against the bare table scan. */
  private def bareSql(e: Expression): String =
    e.transform { case a: AttributeReference => a.withQualifier(Nil) }.sql

  /** Render with qualifiers normalized to `t` (target) / `s` (source) — the
    * aliases Dml.merge joins under. */
  private def tsSql(e: Expression, tSet: AttributeSet, sSet: AttributeSet): String =
    e.transform {
      case a: AttributeReference if tSet.contains(a) => a.withQualifier(Seq("t"))
      case a: AttributeReference if sSet.contains(a) => a.withQualifier(Seq("s"))
    }.sql

  private def assignKey(op: String, k: Expression): String = k match {
    case a: AttributeReference => a.name
    case other => throw new UnsupportedOperationException(
      s"graft $op supports top-level column assignment only, got ${other.sql}")
  }

  private def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(s"graft MERGE INTO does not support $what")

  private def relOutputNamesOf(plan: LogicalPlan): Seq[String] = plan match {
    case SubqueryAlias(_, child) => relOutputNamesOf(child)
    case r: DataSourceV2Relation => r.output.map(_.name)
    case other => other.output.map(_.name)
  }

  private def graftRelation(plan: LogicalPlan): Option[(GraftTable, DataSourceV2Relation)] =
    plan match {
      case SubqueryAlias(_, child) => graftRelation(child)
      case r: DataSourceV2Relation => r.table match {
        case g: GraftTable => Some((g, r))
        case _ => None
      }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    // DELETE with a subquery predicate (IN/EXISTS over another table —
    // reference issue_1235.test): SupportsDelete filters can't express it,
    // so lower to a matched-row delete: the analyzed condition filters the
    // target's file-position scan (relation swapped for the keepFileMeta
    // plan with attribute ids preserved), and the matched (_g_path, _g_pos)
    // rows become positional deletes / DVs. Subquery-free DELETE keeps the
    // SupportsDelete path.
    case d: DeleteFromTable if d.childrenResolved &&
        org.apache.spark.sql.catalyst.expressions.SubqueryExpression.hasSubquery(d.condition) &&
        graftRelation(d.table).isDefined =>
      val (g, rel) = graftRelation(d.table).get
      g.dmlRefusal("DELETE").foreach(msg => throw new UnsupportedOperationException(msg))
      val condition = d.condition
      val relOutput = rel.output
      GraftDmlCommand(s"GraftDeleteSubquery ${g.name()}",
        spark => {
          import org.apache.spark.sql.catalyst.expressions.Alias
          val inner = org.apache.spark.sql.GraftStreamShim.planOf(g.metaScanDF(spark))
          val byName = inner.output.map(a => a.name -> a).toMap
          val aliases = relOutput.map(o =>
            Alias(byName(o.name), o.name)(exprId = o.exprId, qualifier = o.qualifier)) ++
            Seq(byName("_g_path"), byName("_g_pos"))
          val filtered = Filter(condition, Project(aliases, inner))
          val matched = org.apache.spark.sql.GraftStreamShim.dfFromPlan(spark, filtered)
            .select("_g_path", "_g_pos")
          Dml.deleteMatched(spark, g.dmlOps, matched); ()
        })

    // UPDATE with a subquery predicate: same matched-row lowering as
    // DELETE, then rewrite-and-reinsert of the matched rows. Subqueries in
    // SET expressions stay unsupported (they would need per-row plans).
    case u: UpdateTable if u.resolved &&
        u.condition.exists(org.apache.spark.sql.catalyst.expressions.SubqueryExpression.hasSubquery) &&
        graftRelation(u.table).isDefined =>
      val (g, rel) = graftRelation(u.table).get
      g.dmlRefusal("UPDATE").foreach(msg => throw new UnsupportedOperationException(msg))
      if (u.assignments.exists(a =>
          org.apache.spark.sql.catalyst.expressions.SubqueryExpression.hasSubquery(a.value)))
        throw new UnsupportedOperationException(
          "graft UPDATE does not support subqueries in SET expressions")
      val set = u.assignments.map(a => assignKey("UPDATE", a.key) -> bareSql(a.value)).toMap
      val condition = u.condition.get
      val relOutput = rel.output
      GraftDmlCommand(s"GraftUpdateSubquery ${g.name()}",
        spark => {
          import org.apache.spark.sql.catalyst.expressions.Alias
          val inner = org.apache.spark.sql.GraftStreamShim.planOf(
            g.metaScanDF(spark, withLineage = true))
          val byName = inner.output.map(a => a.name -> a).toMap
          val aliases = relOutput.map(o =>
            Alias(byName(o.name), o.name)(exprId = o.exprId, qualifier = o.qualifier)) ++
            inner.output.filter(a => Set("_g_path", "_g_pos", "_row_id").contains(a.name))
          val filtered = Filter(condition, Project(aliases, inner))
          val matched = org.apache.spark.sql.GraftStreamShim.dfFromPlan(spark, filtered)
          Dml.updateMatched(spark, g.dmlOps, matched, set); ()
        })

    case u: UpdateTable if u.resolved && graftTarget(u.table).isDefined =>
      val (g, _) = graftTarget(u.table).get
      g.dmlRefusal("UPDATE").foreach(msg => throw new UnsupportedOperationException(msg))
      val set = u.assignments.map(a => assignKey("UPDATE", a.key) -> bareSql(a.value)).toMap
      val cond = u.condition.map(bareSql).getOrElse("TRUE")
      GraftDmlCommand(s"GraftUpdate ${g.name()}",
        spark => { Dml.update(spark, g.dmlOps, cond, set); () })

    case m: MergeIntoTable if m.resolved && graftTarget(m.targetTable).isDefined =>
      val (g, tSet) = graftTarget(m.targetTable).get
      g.dmlRefusal("MERGE INTO").foreach(msg => throw new UnsupportedOperationException(msg))
      if (m.withSchemaEvolution) unsupported("WITH SCHEMA EVOLUTION")
      val sSet = AttributeSet(m.sourceTable.output)
      val onCond = tsSql(m.mergeCondition, tSet, sSet)

      // Ordered clause lists: conditional and multiple WHEN clauses lower
      // to first-matching-clause-wins semantics in Dml.merge (reference
      // merge_into_multiple_update_delete_actions.test).
      // UPDATE/INSERT SET * assign every target column from the same-named
      // source column (which must exist).
      def starAssignments(): Map[String, String] = {
        val sourceNames = m.sourceTable.output.map(_.name).toSet
        relOutputNamesOf(m.targetTable).map { n =>
          if (!sourceNames.contains(n)) unsupported(
            s"SET * with no source column named '$n'")
          n -> s"s.`$n`"
        }.toMap
      }
      val matchedClauses = m.matchedActions.map {
        case UpdateAction(cond, assigns, _) =>
          Dml.MatchedClause(cond.map(c => tsSql(c, tSet, sSet)), Some(
            assigns.map(a => assignKey("MERGE", a.key) -> tsSql(a.value, tSet, sSet)).toMap))
        case UpdateStarAction(cond) =>
          Dml.MatchedClause(cond.map(c => tsSql(c, tSet, sSet)), Some(starAssignments()))
        case DeleteAction(cond) =>
          Dml.MatchedClause(cond.map(c => tsSql(c, tSet, sSet)), None)
        case other => unsupported(s"WHEN MATCHED action ${other.getClass.getSimpleName}")
      }
      val notMatchedClauses = m.notMatchedActions.map {
        case InsertAction(cond, assigns) =>
          Dml.NotMatchedClause(cond.map(c => tsSql(c, tSet, sSet)),
            assigns.map(a => assignKey("MERGE", a.key) -> tsSql(a.value, tSet, sSet)).toMap)
        case InsertStarAction(cond) =>
          Dml.NotMatchedClause(cond.map(c => tsSql(c, tSet, sSet)), insertAll = true)
        case other => unsupported(s"WHEN NOT MATCHED action ${other.getClass.getSimpleName}")
      }
      val notMatchedBySource = m.notMatchedBySourceActions.map {
        case UpdateAction(cond, assigns, _) =>
          Dml.MatchedClause(cond.map(c => tsSql(c, tSet, sSet)), Some(
            assigns.map(a => assignKey("MERGE", a.key) -> tsSql(a.value, tSet, sSet)).toMap))
        case DeleteAction(cond) =>
          Dml.MatchedClause(cond.map(c => tsSql(c, tSet, sSet)), None)
        case other => unsupported(s"WHEN NOT MATCHED BY SOURCE action ${other.getClass.getSimpleName}")
      }
      val actions = Dml.MergeActions(
        matchedClauses = matchedClauses, notMatchedClauses = notMatchedClauses,
        notMatchedBySourceClauses = notMatchedBySource)
      val sourcePlan = m.sourceTable
      GraftDmlCommand(s"GraftMergeInto ${g.name()}",
        spark => {
          val source = org.apache.spark.sql.GraftStreamShim.dfFromPlan(spark, sourcePlan)
          Dml.merge(spark, g.dmlOps, source, onCond, actions); ()
        })
  }
}

/** A resolved DML statement, lowered to a driver-side call into the engine's
  * DML (which itself runs distributed jobs); planned by Spark's built-in
  * command execution. */
private[graft] case class GraftDmlCommand(desc: String, exec: SparkSession => Unit)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = { exec(spark); Nil }
  override def simpleString(maxFields: Int): String = desc
}
