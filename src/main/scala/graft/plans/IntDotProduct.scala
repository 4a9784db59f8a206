package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: integer dot product of two int-array
  * columns (the int8-quantized embeddings of `Embeddings
  * .withInt8Quantized`), accumulated in long — bit-identical to the
  * `aggregate(zip_with(a, b, (x, y) => x.cast(long) * y.cast(long)))`
  * formulation it replaces, but with `doGenCode` emitting one fused
  * loop into the surrounding whole-stage-codegen instead of
  * higher-order-function eval that allocates a products array per
  * candidate pair. The ANN within-cell scorers run this once per
  * (query, candidate) pair — at 30× SemDeDup that is ~62M pairs, so
  * the per-pair allocation is the measurable cost.
  *
  * Same (b)-tier extension rationale as [[CosineSimilarity]]; registered
  * as SQL `graft_dot_int` by [[GraftExtensions]].
  */
case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += x.getInt(i).toLong * y.getInt(i).toLong
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (long) $a.getInt($i) * (long) $b.getInt($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot_int"
}
