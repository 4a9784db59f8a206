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

  /** Java-regex-`\s` whitespace test, byte-wise: {space, \t, \n, \x0B,
    * \f, \r} — ASCII only, exactly what `split(text, "\\s+")` splits
    * on (Java's default `\s` is NOT Unicode-aware, so NBSP etc. are
    * token bytes). All six are < 0x80, and UTF-8 continuation bytes
    * are ≥ 0x80, so a byte scan can never split inside a multi-byte
    * character.
    */
  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  /** Whitespace token count: the number of maximal non-`\s` byte runs
    * — value-identical to `size(filter(split(text, "\\s+"),
    * t => length(t) > 0))` (split's leading-empty token is filtered,
    * trailing empties are dropped by split itself; both equal run
    * counting) but one byte pass with no regex, no array, no lambda.
    * The HOF form is not codegen-fused (ArrayFilter is
    * CodegenFallback) and measured ~13 s of pure token counting at
    * the 100× corpus (q316's r15 extension).
    */
  def tokenCountWs(s: org.apache.spark.unsafe.types.UTF8String): Int = {
    val n = s.numBytes()
    var count = 0
    var inTok = false
    var i = 0
    while (i < n) {
      val ws = isWs(s.getByte(i))
      if (!ws && !inTok) count += 1
      inTok = !ws
      i += 1
    }
    count
  }
}
