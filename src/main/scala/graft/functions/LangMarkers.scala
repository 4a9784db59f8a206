package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** The language-ID marker table (top function words per language —
  * public-knowledge lists, cf. the reference's metadata conventions
  * and every n-gram langid heuristic) and its word → language bitmask
  * lookup. One static hash probe per token replaces the 6 × 10
  * string-equality `IN` scans the original expression form paid per
  * word — the difference between q288/q314 being a scan-speed pass and
  * a 6-minute job at 100× (5M docs × ~300 words × 60 compares).
  *
  * A word can mark SEVERAL languages ("la" es/fr/it, "is" en/nl, "un"
  * es/fr/it...), so the value is a bitmask over [[langs]] (sorted, so
  * bit i ↔ langs(i) and the alphabetical tiebreak survives). Keyed by
  * UTF8String so the codegen'd call does zero conversion/allocation.
  */
object LangMarkers {

  /** Sorted language codes — bit i of a mask ↔ langs(i). */
  val langs: Seq[String] = Seq("de", "en", "es", "fr", "it", "nl")

  val markersByLang: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "un", "que", "pour", "dans"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "que", "por"),
    "it" -> Seq("il", "la", "di", "e", "che", "un", "una", "per", "non", "sono"),
    "nl" -> Seq("de", "het", "een", "en", "van", "is", "dat", "niet", "met", "op"))

  private val table: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    for ((lang, ms) <- markersByLang; w <- ms) {
      val bit = 1 << langs.indexOf(lang)
      val k = UTF8String.fromString(w)
      val prev = m.get(k)
      m.put(k, if (prev == null) bit else prev | bit)
    }
    m
  }

  /** Bitmask of languages the word marks (0 for non-markers). */
  def mask(w: UTF8String): Int = {
    val v = table.get(w)
    if (v == null) 0 else v.intValue()
  }

  private val langU8: Array[UTF8String] =
    langs.map(UTF8String.fromString).toArray
  private val undU8: UTF8String = UTF8String.fromString("und")

  /** Whole langId verdict over a tokenized words array in ONE pass:
    * per token one hash probe, per-language counts from the bitmask,
    * argmax with the alphabetical (lowest-index) tiebreak, "und" when
    * nothing marks. Exists because Spark's whole-stage-codegen
    * subexpression elimination does not cover higher-order functions —
    * a 6-way `greatest(size(filter(...)))` form re-evaluates the
    * tokenization per language (the r14 100×-sweep finding: 6 × the
    * corpus regex split). Null tokens score nothing (the words()
    * builder never emits them; belt and braces).
    */
  def langId(words: org.apache.spark.sql.catalyst.util.ArrayData)
      : UTF8String = {
    val counts = new Array[Int](langs.length)
    var i = 0
    val n = words.numElements()
    while (i < n) {
      if (!words.isNullAt(i)) {
        var m = mask(words.getUTF8String(i))
        var b = 0
        while (m != 0) {
          if ((m & 1) != 0) counts(b) += 1
          m >>>= 1
          b += 1
        }
      }
      i += 1
    }
    var best = 0
    var bi = 0
    i = 0
    while (i < counts.length) {
      if (counts(i) > best) { best = counts(i); bi = i }
      i += 1
    }
    if (best > 0) langU8(bi) else undU8
  }
}
