package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native Catalyst expression: |A ∩ B| of two ASCENDING-sorted long
  * arrays by two-pointer merge — O(m+n) primitive comparisons, no hash
  * set, no boxing. `array_intersect` builds a per-row hash map of boxed
  * longs; on the set-similarity verify path (millions of candidate
  * pairs × hundreds of digests each) this merge is ~20× cheaper and
  * fuses into whole-stage codegen.
  *
  * Inputs MUST be sorted ascending and duplicate-free (the caller's
  * `sort_array` over distinct digests guarantees both); the result is
  * then the exact intersection cardinality.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val m = x.numElements(); val n = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < m && j < n) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $m = $a.numElements(); int $n = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $m && $j < $n) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sorted_intersect"
}
