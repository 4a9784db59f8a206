package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

import graft.operators.Sketches

/** Native Catalyst aggregate for the HLL distinct-count sketch — the
  * CONSTANT-STATE form of [[graft.operators.Sketches.hllRegisters]]:
  * where the sketch-as-table formulation shuffles ≤ |groups|·m register
  * rows, this aggregate carries exactly m bytes (256) per group through
  * Spark's standard partial/final aggregation, merging map-side like
  * `sum` does. Same hash, same register rule, same exact integer
  * estimate — bit-identical output, different cost shape, one oracle
  * (q150 gates this path against q141's SQL).
  *
  * State = the register array itself (`Array[Byte]`, rho per bucket);
  * serialize/deserialize are identity, so the inter-stage wire format
  * is the 256-byte sketch. Null inputs are ignored (SQL aggregate
  * convention).
  */
case class HllSketchAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  override def dataType: DataType = StructType(Seq(
    StructField("n_set", LongType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("small_range", BooleanType, nullable = false)))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](Sketches.HllM)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val (b, r) = Sketches.hllBucketRho(v.asInstanceOf[Long])
      if (r > buf(b)) buf(b) = r.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < b1.length) {
      if (b2(i) > b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
    var nSet = 0L
    var sSet = BigInt(0)
    var i = 0
    while (i < buf.length) {
      val r = buf(i)
      if (r > 0) {
        nSet += 1
        sSet += BigInt(1) << (Sketches.HllRhoMax - r)
      }
      i += 1
    }
    val s = (BigInt(Sketches.HllM - nSet) << Sketches.HllRhoMax) + sSet
    val den = s * BigInt(1000000000L)
    val est = (Sketches.HllNumer / den).toLong
    val small = Sketches.HllNumer * 2 <= den * (5L * Sketches.HllM)
    new GenericInternalRow(Array[Any](nSet, est, small))
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_hll"
}
