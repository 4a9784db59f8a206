package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word → language-marker bitmask (see
  * [[graft.functions.LangMarkers]]): ONE static hash probe per token
  * inside whole-stage codegen, replacing the per-language `IN`-list
  * scans in the langId hot path. The langId consumers run this over
  * every token of the corpus — at 100 TB this is scan-speed work or
  * it is the bottleneck (the r14 q314 100×-sweep lesson: 353 s of
  * marker `IN` compares on an otherwise sub-minute query). Bit i of
  * the mask ↔ LangMarkers.langs(i) (sorted codes — the alphabetical
  * tiebreak is positional).
  */
case class LangMarkerMask(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_lang_mask requires a STRING argument, got ${child.dataType.sql}")

  override def nullSafeEval(w: Any): Any =
    graft.functions.LangMarkers.mask(w.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, w => s"graft.functions.LangMarkers.mask($w)")

  override protected def withNewChildInternal(newChild: Expression): LangMarkerMask =
    copy(child = newChild)

  override def prettyName: String = "graft_lang_mask"
}

/** Native langId verdict over a TOKENIZED words array (see
  * [[graft.functions.LangMarkers.langId]]): one pass, one hash probe
  * per token, argmax + alphabetical tiebreak in Java. The child is
  * Spark's own `words()` split — tokenization semantics (and thus
  * every langId oracle) are untouched; this expression only collapses
  * the 6-language scoring that whole-stage codegen could not
  * common-subexpression-eliminate across higher-order functions.
  */
case class LangIdFromWords(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_lang_id requires ARRAY<STRING>, got ${other.sql}")
    }

  override def nullSafeEval(ws: Any): Any =
    graft.functions.LangMarkers.langId(
      ws.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      ws => s"graft.functions.LangMarkers.langId($ws)")

  override protected def withNewChildInternal(newChild: Expression): LangIdFromWords =
    copy(child = newChild)

  override def prettyName: String = "graft_lang_id"
}

/** Native Flesch–Kincaid syllable sum over a TOKENIZED words array
  * (see [[graft.functions.TextKernels.syllableSum]]): Σ max(1, vowel
  * runs) in one byte-wise pass. The HOF form
  * (`aggregate(ws, regexp_extract_all...)`) pays a regex Matcher and
  * a match-array allocation per word AND re-tokenizes per reference —
  * the r14 100× sweep measured it at >20 min for the 5M-doc corpus;
  * this expression is one scan.
  */
case class SyllableSum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_syllable_sum requires ARRAY<STRING>, got ${other.sql}")
    }

  override def nullSafeEval(ws: Any): Any =
    graft.functions.TextKernels.syllableSum(
      ws.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      ws => s"graft.functions.TextKernels.syllableSum($ws)")

  override protected def withNewChildInternal(newChild: Expression): SyllableSum =
    copy(child = newChild)

  override def prettyName: String = "graft_syllable_sum"
}

/** Native whitespace token count (see
  * [[graft.functions.TextKernels.tokenCountWs]]): the number of
  * maximal non-`\s` byte runs, value-identical to
  * `size(filter(split(text, "\\s+"), t => length(t) > 0))` but one
  * codegen'd byte pass — the HOF form's ArrayFilter is
  * CodegenFallback and pays regex + array + lambda per row on every
  * q79-convention token count (packing, context planning, length
  * profiles, budget tables).
  */
case class TokenCountWs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_token_count_ws requires a STRING argument, got ${child.dataType.sql}")

  override def nullSafeEval(s: Any): Any =
    graft.functions.TextKernels.tokenCountWs(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"graft.functions.TextKernels.tokenCountWs($s)")

  override protected def withNewChildInternal(newChild: Expression): TokenCountWs =
    copy(child = newChild)

  override def prettyName: String = "graft_token_count_ws"
}
