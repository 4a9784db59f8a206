package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode normalization (NFC/NFD/NFKC/NFKD)
  * of a string column — the canonicalization step every text-dedup /
  * fingerprint pipeline needs before hashing (the same visible text can
  * arrive precomposed or as base+combining sequences and must digest
  * identically).
  *
  * Spark ships no normalization function, so this is the (b)-tier
  * extension path from SURVEY §2: a codegen'd `UnaryExpression` (no UDF
  * boxing, stays inside whole-stage codegen; the JDK normalizer call is
  * emitted directly into the generated stage). The ASCII fast path skips
  * the normalizer entirely — `Normalizer.isNormalized` is O(n) and
  * almost always true for crawl text, so the common case is one scan and
  * zero allocation.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  require(UnicodeNormalize.forms.contains(form),
    s"unknown normalization form $form (expected one of ${UnicodeNormalize.forms})")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""${ev.value} = graft.plans.UnicodeNormalize.normalize($in, "$form");""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)

  override def prettyName: String = "graft_normalize"
}

object UnicodeNormalize {
  val forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Kernel shared by interpreted eval and generated code. Already-
    * normalized strings (the overwhelmingly common case) are returned
    * as-is — no String round-trip, no new UTF8String.
    */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = Normalizer.Form.valueOf(form)
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }
}
