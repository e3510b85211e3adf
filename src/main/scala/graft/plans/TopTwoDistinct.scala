package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  AttributeReference, CaseWhen, CreateNamedStruct, EqualTo, Expression,
  Greatest, GreaterThan, GreaterThanOrEqual, If, IsNull, Least, LessThan,
  LessThanOrEqual, Literal, Or
}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/**
 * Aggregate support for the `key = key AND s <> probe.s AND d OP probe.d`
 * semi/anti build reduction in [[DistinctifySemiAntiBuilds]] (the
 * reference's q21 waiting-supplier NOT-EXISTS correlation,
 * `tpch.benchmark.in:68-71`).
 *
 * Per group it computes the extreme of `d` under a one-`s` exclusion:
 * with `f(x) = ext{ d : s ≠ x }` (ext = max when `descending`, else min),
 * the existence question `∃ row: s ≠ x ∧ d OP probe.d` reduces to
 * `f(x) OP probe.d`. The buffer holds three scalars:
 *
 *   - `(s1, d1)`: an argmax — `d1 = ext(d)` over the group, `s1` the `s`
 *     of one row achieving it;
 *   - `d2 = ext{ d : s ≠ s1 }` (NULL when `s1` is the only distinct `s`).
 *
 * Then `f(x) = if (x = s1) d2 else d1`, EXACTLY — including ties: when two
 * distinct `s` values achieve `d1`, the merge/update rules below force
 * `d2 = d1`, so excluding either still yields `d1`.
 *
 * Update invariant (rows with NULL `s` or NULL `d` are skipped, mirroring
 * Min/Max — such rows can never satisfy `s <> x AND d OP y`):
 *   - same `s` as `s1`: only `d1` can improve; `d2`'s exclusion set is
 *     unchanged.
 *   - new extreme from a different `s`: the OLD `d1` is the extreme of
 *     every row outside the NEW `s1`'s rows (it dominated them all), so
 *     `d2 := old d1` — discarding any contamination of `d2` by the new
 *     `s1`'s earlier rows.
 *   - otherwise: the row joins the exclusion-complement, `d2 := ext(d2, d)`.
 * Merge follows the same argument with the losing side's `d1` standing in
 * for its whole buffer (it dominates every row that side has seen).
 *
 * Declarative (not imperative) so partial aggregation stays inside
 * whole-stage-codegen'd HashAggregate — the build-side volume collapse
 * happens map-side, before the shuffle. Callers gate on fixed-length
 * buffer types (see [[DistinctifySemiAntiBuilds]]) so the hash aggregate
 * never degrades to sort-based.
 */
case class TopTwoDistinctExtreme(
    sExpr: Expression,
    dExpr: Expression,
    descending: Boolean)
  extends DeclarativeAggregate with BinaryLike[Expression] {

  override def left: Expression = sExpr
  override def right: Expression = dExpr
  override def nullable: Boolean = true
  override def prettyName: String = "top_two_distinct_extreme"

  override def dataType: DataType = StructType(Seq(
    StructField("s1", sExpr.dataType),
    StructField("d1", dExpr.dataType),
    StructField("d2", dExpr.dataType)))

  override def checkInputDataTypes(): TypeCheckResult = {
    val dOrd = TypeUtils.checkForOrderingExpr(dExpr.dataType, prettyName)
    if (dOrd.isSuccess) TypeUtils.checkForOrderingExpr(sExpr.dataType, prettyName)
    else dOrd
  }

  private lazy val s1 = AttributeReference("s1", sExpr.dataType)()
  private lazy val d1 = AttributeReference("d1", dExpr.dataType)()
  private lazy val d2 = AttributeReference("d2", dExpr.dataType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(s1, d1, d2)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, sExpr.dataType),
    Literal.create(null, dExpr.dataType),
    Literal.create(null, dExpr.dataType))

  /** `a` strictly beats `b` in the tracked direction. */
  private def beats(a: Expression, b: Expression): Expression =
    if (descending) GreaterThan(a, b) else LessThan(a, b)

  /** Extreme of the operands, NULL-skipping (Greatest/Least semantics). */
  private def ext(a: Expression, b: Expression): Expression =
    if (descending) Greatest(Seq(a, b)) else Least(Seq(a, b))

  override lazy val updateExpressions: Seq[Expression] = {
    val skip = Or(IsNull(sExpr), IsNull(dExpr))
    // Branch order matters: the empty-buffer check guards s1's nullability
    // for the EqualTo below (s1 is non-NULL whenever d1 is).
    val newS1 = CaseWhen(Seq(
      (IsNull(d1), sExpr),
      (EqualTo(sExpr, s1), s1),
      (beats(dExpr, d1), sExpr)), Some(s1))
    val newD1 = CaseWhen(Seq(
      (IsNull(d1), dExpr),
      (EqualTo(sExpr, s1), ext(d1, dExpr)),
      (beats(dExpr, d1), dExpr)), Some(d1))
    val newD2 = CaseWhen(Seq(
      (IsNull(d1), Literal.create(null, dExpr.dataType)),
      (EqualTo(sExpr, s1), d2),
      (beats(dExpr, d1), d1)), Some(ext(d2, dExpr)))
    Seq(
      If(skip, s1, newS1),
      If(skip, d1, newD1),
      If(skip, d2, newD2))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val leftEmpty = IsNull(d1.left)
    val rightEmpty = IsNull(d1.right)
    // Ties prefer the left buffer's argmax; the right's d1 then feeds d2,
    // correctly recording that a DIFFERENT s also achieves the extreme
    // (when the argmaxes coincide the sameS branch keeps d2 exact instead).
    val leftWins =
      if (descending) GreaterThanOrEqual(d1.left, d1.right)
      else LessThanOrEqual(d1.left, d1.right)
    val sameS = EqualTo(s1.left, s1.right)
    val mS1 = CaseWhen(Seq(
      (leftEmpty, s1.right),
      (rightEmpty, s1.left),
      (leftWins, s1.left)), Some(s1.right))
    val mD1 = CaseWhen(Seq(
      (leftEmpty, d1.right),
      (rightEmpty, d1.left)), Some(ext(d1.left, d1.right)))
    val mD2 = CaseWhen(Seq(
      (leftEmpty, d2.right),
      (rightEmpty, d2.left),
      (leftWins,
        If(sameS, ext(d2.left, d2.right), ext(d2.left, d1.right)))),
      Some(If(sameS, ext(d2.left, d2.right), ext(d2.right, d1.left))))
    Seq(mS1, mD1, mD2)
  }

  override lazy val evaluateExpression: Expression =
    CreateNamedStruct(Seq(
      Literal("s1"), s1, Literal("d1"), d1, Literal("d2"), d2))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopTwoDistinctExtreme =
    copy(sExpr = newLeft, dExpr = newRight)
}
