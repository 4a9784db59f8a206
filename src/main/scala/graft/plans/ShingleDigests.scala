package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native k-char shingle digests: the ASCENDING-sorted distinct FNV-1a
  * 64-bit digests of every k-char window of the input — the digest-space
  * image of `Dedup.shingles` without materializing a single substring.
  *
  * The string formulation (`transform(sequence, substr)` +
  * `array_distinct`) allocates one UTF8String per window and
  * deduplicates by string hashing — O(len·k) allocations per document
  * and the dominant cost of the set-similarity join's build stage. This
  * expression walks the char array once per window position, folds k
  * chars into a long, sorts and dedups primitives in place. Output
  * order matches [[SortedIntersectCount]]'s input contract directly.
  *
  * Apply `lower()` upstream for case-folding parity with
  * `Dedup.shingles`. Like there, a text shorter than k yields one
  * (short-window) digest. Per-row work is the whole cost (documents,
  * not billions of tiny rows), so interpreted eval via CodegenFallback
  * costs nothing measurable.
  */
case class ShingleDigests(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k > 0, "shingle width must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    val m = math.max(1, n - k + 1)
    val arr = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0xcbf29ce484222325L // FNV-1a offset basis
      var j = i
      val end = math.min(i + k, n)
      while (j < end) {
        h ^= s.charAt(j)
        h *= 0x100000001b3L // FNV-1a prime
        j += 1
      }
      arr(i) = h
      i += 1
    }
    java.util.Arrays.sort(arr)
    var w = 0
    var r = 0
    while (r < m) {
      if (r == 0 || arr(r) != arr(r - 1)) { arr(w) = arr(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(arr, w))
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleDigests =
    copy(child = newChild)

  override def prettyName: String = "graft_shingle_digests"
}
