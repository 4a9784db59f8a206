package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 2-D Hilbert-curve index of two long
  * columns' low 16 bits — [[MortonInterleave]]'s sibling layout key
  * with strictly better locality: consecutive Hilbert indices are
  * always grid-adjacent (Z-order jumps across the plane every power
  * of two), so range-partitioning a table by `hkey` gives each file a
  * tighter bounding rectangle in both filter dimensions than the same
  * file count under `zkey` — fewer files overlap any query box, more
  * files prune. The per-row cost is 16 branch-light rounds (the
  * published xy2d recipe: quadrant bit, Gray-code accumulate,
  * reflect+swap rotation), codegen'd so the re-layout scan stays in
  * whole-stage codegen.
  *
  * Convention mirrors `graft_morton`: inputs modulo 2^16, output in
  * [0, 2^32). Registered as SQL `graft_hilbert` by [[GraftExtensions]].
  */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.HilbertIndex.xy2d($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_hilbert"
}

object HilbertIndex {

  /** Hilbert d-index of (x mod 2¹⁶, y mod 2¹⁶) on the order-16 curve —
    * the textbook xy2d walk: top-down per quadrant bit, d += s²·gray,
    * then the reflect-and-swap rotation over the FULL n = 2¹⁶ grid.
    */
  def xy2d(x0: Long, y0: Long): Long = {
    var x = x0 & 0xFFFFL
    var y = y0 & 0xFFFFL
    var d = 0L
    var s = 1L << 15
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = 65535L - x
          y = 65535L - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
