package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined chunking: the
  * [[graft.functions.Hashing.cdcChunks]] Gear walk as a Catalyst
  * expression — `array<struct<start int, len int, digest long>>` per
  * document, one char-array pass, no substring materialization.
  *
  * The UDF form this replaces paid a UTF8String→String→UDF boxing
  * round-trip plus a reflection encoder for the tuple array on EVERY
  * document — on the q206 hot path (each doc is walked exactly once at
  * corpus scale) that wrapper was most of the cost. Per-row work
  * dominates here (documents, not billions of tiny rows), so
  * interpreted eval via CodegenFallback costs nothing measurable —
  * the [[ShingleDigests]] trade. A null document yields null (and
  * `explode` then drops the row — same outcome as the empty text's
  * empty array).
  */
case class CdcChunksExpr(child: Expression, minLen: Int, maxLen: Int,
    maskBits: Int) extends UnaryExpression with CodegenFallback {

  require(minLen >= 1 && maxLen >= minLen && maskBits >= 1,
    "graft_cdc_chunks needs 1 <= minLen <= maxLen and maskBits >= 1")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("digest", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val chunks = graft.functions.Hashing.cdcChunks(
      input.asInstanceOf[UTF8String].toString, minLen, maxLen, maskBits)
    new GenericArrayData(chunks.map { case (s, l, d) =>
      new GenericInternalRow(Array[Any](s, l, d)): Any
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunksExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_cdc_chunks"
}
