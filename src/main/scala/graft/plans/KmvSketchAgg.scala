package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

import graft.functions.Hashing

/** Native KMV (k-minimum-values / bottom-k) distinct-count sketch: the
  * k smallest splitmix64 hashes of the input, kept as bounded sorted
  * state through standard partial/final aggregation. The HLL
  * aggregate's ([[HllSketchAgg]]) sibling with a different
  * accuracy/state trade: ~1/√k relative error with EXACT counts below
  * k (HLL is never exact), at 8k bytes of state vs HLL's fixed 256.
  *
  * Estimate (n ≥ k): est = ⌊(k−1)·2⁶⁴ / u_k⌋ where u_k is the k-th
  * smallest hash as an unsigned 64-bit value — pure integer arithmetic,
  * and splitmix64 is a bijection, so |distinct inputs| ≡ |distinct
  * hashes| and the whole path replays exactly in an independent engine
  * (the q141 HLL discipline). Below k the sketch IS the distinct set:
  * est = n exactly.
  *
  * State: longs stored sign-flipped (h ⊕ 2⁶³) so SIGNED array order
  * equals unsigned hash order; insert = binary search + bounded
  * arraycopy; merge = sorted-merge keeping the k smallest distinct.
  */
case class KmvSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(k > 1, "graft_kmv needs k > 1")

  // Strict bigint input — mismatches fail analysis, not update().
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv requires a BIGINT argument, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_state", LongType, nullable = false),
    StructField("est", LongType, nullable = false)))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val f = Hashing.splitmix64(v.asInstanceOf[Long]) ^ Long.MinValue
    val pos = java.util.Arrays.binarySearch(buf, f)
    if (pos >= 0) return buf // already present
    val ins = -pos - 1
    if (buf.length < k) {
      val out = new Array[Long](buf.length + 1)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = f
      System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
      out
    } else if (ins < k) {
      System.arraycopy(buf, ins, buf, ins + 1, k - ins - 1)
      buf(ins) = f
      buf
    } else buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(k, b1.length + b2.length))
    var i = 0; var j = 0; var w = 0
    while (w < out.length && (i < b1.length || j < b2.length)) {
      val take =
        if (i >= b1.length) { val x = b2(j); j += 1; x }
        else if (j >= b2.length) { val x = b1(i); i += 1; x }
        else if (b1(i) < b2(j)) { val x = b1(i); i += 1; x }
        else if (b1(i) > b2(j)) { val x = b2(j); j += 1; x }
        else { val x = b1(i); i += 1; j += 1; x }
      if (w == 0 || out(w - 1) != take) { out(w) = take; w += 1 }
    }
    if (w == out.length) out else java.util.Arrays.copyOf(out, w)
  }

  override def eval(buf: Array[Long]): Any = KmvSketchAgg.evalState(buf, k)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 8 * buf.length)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  // (companion holds the shared state→(n, est) evaluation)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_kmv"
}

object KmvSketchAgg {
  /** (n_state, est) from a sign-flipped sorted distinct state array —
    * shared by the aggregate's eval and [[KmvEstimate]] (the
    * streaming-state readout path, q200).
    */
  def evalState(buf: Array[Long], k: Int): GenericInternalRow = {
    val n = buf.length.toLong
    val est =
      if (buf.length < k) n
      else {
        val uk = (BigInt(buf(k - 1) ^ Long.MinValue) + (BigInt(1) << 64)) %
          (BigInt(1) << 64)
        val den = if (uk.signum == 0) BigInt(1) else uk
        ((BigInt(k - 1) << 64) / den).toLong
      }
    new GenericInternalRow(Array[Any](n, est))
  }
}

/** Scalar readout of a KMV state array (sign-flipped sorted minima —
  * e.g. carried through the streaming state store): same struct and
  * the same integer arithmetic as [[KmvSketchAgg]]'s eval.
  */
case class KmvEstimate(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(k > 1, "graft_kmv_estimate needs k > 1")
  override def dataType: DataType = StructType(Seq(
    StructField("n_state", LongType, nullable = false),
    StructField("est", LongType, nullable = false)))
  override def nullSafeEval(a: Any): Any =
    KmvSketchAgg.evalState(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray(), k)
  override protected def withNewChildInternal(newChild: Expression): KmvEstimate =
    copy(child = newChild)
  override def prettyName: String = "graft_kmv_estimate"
}
