package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Per-row text kernels backing codegen'd native expressions — one
  * array pass, zero allocation, for hot-path per-word arithmetic that
  * higher-order-function forms pay regex/Matcher/array costs for (and
  * re-tokenize: codegen subexpression elimination does not cover
  * HOFs — the r14 langId/readability findings).
  */
object TextKernels {

  @inline private def isVowel(c: Byte): Boolean = c match {
    case 'a' | 'e' | 'i' | 'o' | 'u' | 'y' => true
    case _ => false
  }

  /** Σ over words of max(1, number of maximal [aeiouy]+ runs) — the
    * Flesch–Kincaid syllable estimate over an already-tokenized words
    * array (the `words()` output is lowercase ASCII-ish, so byte-wise
    * vowel tests equal the oracle's `[aeiouy]+` regex runs). Null
    * elements score nothing (words() never emits them).
    */
  def syllableSum(words: ArrayData): Long = {
    var total = 0L
    var i = 0
    val n = words.numElements()
    while (i < n) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i)
        val len = w.numBytes()
        var runs = 0
        var inRun = false
        var j = 0
        while (j < len) {
          val v = isVowel(w.getByte(j))
          if (v && !inRun) runs += 1
          inRun = v
          j += 1
        }
        total += (if (runs > 0) runs else 1)
      }
      i += 1
    }
    total
  }
}
