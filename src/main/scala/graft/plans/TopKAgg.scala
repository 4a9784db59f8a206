package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native bounded top-k aggregate: the k largest (ord, id) pairs per
  * group by (ord DESC, id ASC), as `array<struct<ord double, id
  * bigint>>` in that order.
  *
  * This is the CONSTANT-STATE form of the window top-k (row_number ≤ k
  * over PARTITION BY group ORDER BY ord DESC): the window shuffles and
  * SORTS every input row; this aggregate carries at most 2k pairs per
  * group through Spark's standard partial/final aggregation
  * (ObjectHashAggregate), so the shuffle moves ≤ 2k·|groups| pairs and
  * nothing is ever globally sorted. Selection is a multiset total order
  * — identical to the window's ORDER BY with the id tiebreak, so one
  * relational oracle gates both paths.
  *
  * State: an unsorted buffer compacted to the k best whenever it
  * reaches 2k (amortized O(log k) per row, no heap bookkeeping on the
  * wire); serialize writes (n, pairs) raw — the inter-stage format is
  * at most 2k·16 bytes. Null ord/id rows are ignored (SQL aggregate
  * convention).
  */
case class TopKAgg(ord: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]]
  with BinaryLike[Expression] {

  require(k > 0, "graft_topk needs k > 0")

  override def left: Expression = ord
  override def right: Expression = id

  // Strict (ord: double, id: bigint) — a DECIMAL/INT input is an
  // ANALYSIS error, not a runtime ClassCastException in update().
  override def checkInputDataTypes(): TypeCheckResult =
    if (ord.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_topk requires (DOUBLE ord, BIGINT id), got " +
        s"(${ord.dataType.sql}, ${id.dataType.sql})")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  // (ord DESC, id ASC) — the window's ORDER BY as an Ordering.
  // java.lang.Double.compare, not raw >: a total order (NaN sorts
  // above +Inf, exactly Spark's DESC NULLS/NaN placement) — raw >
  // returns false BOTH ways on NaN and breaks sortWith's contract.
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  private def compact(buf: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    if (buf.length > k) {
      val sorted = buf.sortWith(better)
      buf.clear()
      buf ++= sorted.take(k)
    }
    buf
  }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    new ArrayBuffer[(Double, Long)](k + 1)

  override def update(buf: ArrayBuffer[(Double, Long)],
      input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val o = ord.eval(input); val i = id.eval(input)
    if (o != null && i != null) {
      buf += ((o.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.length >= 2 * k) compact(buf)
    }
    buf
  }

  override def merge(b1: ArrayBuffer[(Double, Long)],
      b2: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    b1 ++= b2
    compact(b1)
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    val top = buf.sortWith(better).take(k)
    new GenericArrayData(top.map { case (o, i) =>
      new GenericInternalRow(Array[Any](o, i)): Any
    }.toArray)
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 16 * buf.length)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (o, i) => out.writeDouble(o); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[(Double, Long)](n)
    var i = 0
    while (i < n) {
      buf += ((in.readDouble(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(ord = newLeft, id = newRight)
  override def prettyName: String = "graft_topk"
}
