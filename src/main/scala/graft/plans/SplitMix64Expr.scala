package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: the splitmix64 finalizer, bit-identical
  * to [[graft.functions.Hashing.splitmix64]]. Exists because the Column
  * formulation (`xor`/`shiftrightunsigned`/`*`) trips ANSI overflow
  * checking on the wrapping multiplies — here the Java `*` wraps by
  * definition and fuses into whole-stage codegen.
  */
case class SplitMix64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_splitmix64 requires BIGINT, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    graft.functions.Hashing.splitmix64(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val z = ctx.freshName("z")
      s"""
         |long $z = $x;
         |$z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
         |$z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
         |${ev.value} = $z ^ ($z >>> 31);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SplitMix64Expr =
    copy(child = newChild)

  override def prettyName: String = "graft_splitmix64"
}
