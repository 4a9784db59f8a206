package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 2-D Morton (Z-order) interleave of two
  * long columns' low 16 bits — the layout-clustering key behind
  * multi-dimension data skipping. Sorting (or range-partitioning) a
  * table by the Z-value of two filter dimensions gives every file
  * bounded min/max ranges in BOTH dimensions, so scans filtered on
  * either one prune files; a plain compound sort only prunes on its
  * leading column. Same (b)-tier extension rationale as
  * [[CosineSimilarity]]: a codegen'd kernel (five shift/mask rounds per
  * side, no branches) that stays inside whole-stage codegen where a UDF
  * would box every row of the table being re-laid-out.
  *
  * Convention: x occupies even bit positions, y odd; inputs are taken
  * modulo 2^16 (callers bucket their dimensions first — 65536 buckets
  * per dimension out-resolves any practical file count), so the result
  * is in [0, 2^32) and never touches the sign bit on any engine.
  * Registered as SQL `graft_morton` by [[GraftExtensions]].
  */
case class MortonInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    MortonInterleave.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.MortonInterleave.interleave($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): MortonInterleave =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_morton"
}

object MortonInterleave {

  /** Spread the low 16 bits of `v` to the even bit positions of a
    * 32-bit value (the classic magic-number dilation).
    */
  def spread16(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Z-value of (x, y): x's bits at even positions, y's at odd. */
  def interleave(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)
}
