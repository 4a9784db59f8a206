package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for [[graft.functions.FixedMath.lnQ12]]:
  * fixed-point ln(k)·10¹² as a long, the cross-engine-deterministic
  * log every transcendental-bearing analytics operator (entropy,
  * Kaplan–Meier) routes through. A codegen'd static call keeps the
  * per-(key,category) count path inside whole-stage codegen — at
  * 100 TB the count table this runs over is itself large, so a boxed
  * UDF here would sit on a hot path. Type-checked at analysis time
  * (the ADVICE.md TopKAgg lesson): a non-long child is an analysis
  * error, not an executor ClassCastException. Registered as SQL
  * `graft_ln_q12` by [[GraftExtensions]].
  */
case class FixedPointLn(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ln_q12 requires a BIGINT argument, got ${child.dataType.sql}")

  override def nullSafeEval(k: Any): Any =
    graft.functions.FixedMath.lnQ12(k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, k => s"graft.functions.FixedMath.lnQ12($k)")

  override protected def withNewChildInternal(newChild: Expression): FixedPointLn =
    copy(child = newChild)

  override def prettyName: String = "graft_ln_q12"
}

/** Native floor-isqrt of a non-negative BIGINT — the standalone form
  * of the integer square root inside [[WilsonLowerBoundQ9]], exposed
  * for fractional-power fixed-point arithmetic (x^(1/2) exactly; the
  * temperature-mixture α = 1/2 path). Replayed oracle-side by
  * [[graft.functions.FixedMath.isqrtCteSql]]'s Newton CTE — both
  * engines agree bit-for-bit.
  */
case class FixedPointIsqrt(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_isqrt requires a BIGINT argument, got ${child.dataType.sql}")

  override def nullSafeEval(k: Any): Any =
    graft.functions.FixedMath.isqrt(k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, k => s"graft.functions.FixedMath.isqrt($k)")

  override protected def withNewChildInternal(newChild: Expression): FixedPointIsqrt =
    copy(child = newChild)

  override def prettyName: String = "graft_isqrt"
}

/** Native Catalyst expression for
  * [[graft.functions.FixedMath.wilsonLbQ9]]: the Wilson-score lower
  * bound from exact (trials, conversions) longs as a 10⁻⁹ fixed-point
  * long — integer arithmetic + floor-isqrt only, so Spark and the
  * DuckDB oracle agree bit-for-bit on any build. Runs once per group
  * after aggregation (cold path); it is an expression rather than a
  * UDF so misuse fails at analysis time and the value stays unboxed.
  */
case class WilsonLowerBoundQ9(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_wilson_lb_q9 requires (BIGINT trials, BIGINT conversions), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(trials: Any, conversions: Any): Any =
    graft.functions.FixedMath.wilsonLbQ9(
      trials.asInstanceOf[Long], conversions.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (n, s) => s"graft.functions.FixedMath.wilsonLbQ9($n, $s)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): WilsonLowerBoundQ9 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_wilson_lb_q9"
}
