package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: integer exponentially-weighted moving
  * average over a time-ordered long array. With α = 1/den,
  *
  *   s₀ = x₀;   sᵢ = ⌊(xᵢ + (den−1)·sᵢ₋₁) / den⌋   (floor division)
  *
  * — the EWMA recurrence entirely in integer arithmetic, so the result
  * is deterministic across engines: DuckDB's `//` is floor division and
  * `Math.floorDiv` matches it exactly, including on negative smoothed
  * values (a truncating `/` would diverge there). The recurrence is
  * order-dependent by definition, which is why it runs as one linear
  * walk over the per-key `sort_array(collect_list(...))` series rather
  * than a window aggregate.
  *
  * Input values must satisfy |x| < 2⁶²/den so `x + (den−1)·s` cannot
  * overflow (s is a convex-ish combination of past x's, bounded by
  * max|x|); tenk-unit daily sums are far inside that.
  *
  * Codegen'd: the walk fuses into whole-stage codegen with a primitive
  * long array, no boxing.
  */
case class IntEwma(child: Expression, den: Int) extends UnaryExpression {

  require(den >= 2, "graft_int_ewma needs den >= 2")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // Strict array<bigint> with non-null elements — a null slot would
  // read as 0 silently; make it an analysis error instead.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, true) => TypeCheckResult.TypeCheckFailure(
      "graft_int_ewma requires array<bigint> with non-null elements " +
        "(aggregate non-null inputs or filter first)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_int_ewma requires array<bigint>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val out = new Array[Long](n)
    var i = 0
    var s = 0L
    while (i < n) {
      val x = xs.getLong(i)
      s = if (i == 0) x else Math.floorDiv(x + (den - 1L) * s, den.toLong)
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val out = ctx.freshName("out")
      val d = den.toLong
      s"""
         |int $n = $xs.numElements();
         |long[] $out = new long[$n];
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long x = $xs.getLong($i);
         |  $s = ($i == 0) ? x : Math.floorDiv(x + ${d - 1L}L * $s, ${d}L);
         |  $out[$i] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): IntEwma =
    copy(child = newChild)

  override def prettyName: String = "graft_int_ewma"
}
