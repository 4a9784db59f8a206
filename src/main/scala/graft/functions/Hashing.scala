package graft.functions

/** Single-pass hashing kernels for the dedup/similarity operators.
  *
  * The naive expression formulation (`numHashes` × `transform`/`aggregate`
  * over the shingle array) re-traverses each document 32–64 times and
  * dominated the benchmark; these kernels do one pass over the text /
  * vector with all hash registers in local variables. Hash family:
  * FNV-1a base hash + splitmix64 finalizer per seed — deterministic
  * across executors/runs (no stored model), public constants.
  */
object Hashing {

  @inline private def splitmix(z0: Long): Long = {
    var x = z0
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** splitmix64 finalizer (public for deterministic, oracle-replayable
    * orderings — e.g. IVF seed selection in `Similarity.ivfTopKInt8`).
    */
  def splitmix64(x: Long): Long = splitmix(x)

  /** MinHash signature over distinct character k-shingles, one text pass.
    * sig[m] = min over shingles of splitmix(fnv(shingle) + C*(m+1)).
    */
  def minhashSignature(text: String, k: Int, numHashes: Int): Array[Long] = {
    // null text signs like the empty document (curation keeps the row
    // and lets downstream quality gates reject it, instead of an
    // executor NPE killing the whole near-dup job)
    val t = if (text == null) "" else text.toLowerCase
    val n = math.max(1, t.length - (k - 1))
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val seen = new java.util.HashSet[Long](math.min(n * 2, 1 << 16))
    var i = 0
    while (i < n) {
      var h = 0xcbf29ce484222325L
      val end = math.min(i + k, t.length)
      var j = i
      while (j < end) { h ^= t.charAt(j); h *= 0x100000001b3L; j += 1 }
      if (seen.add(h)) {
        var m = 0
        while (m < numHashes) {
          val x = splitmix(h + 0x9e3779b97f4a7c15L * (m + 1))
          if (x < sig(m)) sig(m) = x
          m += 1
        }
      }
      i += 1
    }
    sig
  }

  /** 64-bit SimHash over whitespace tokens, one pass: per-bit counters of
    * token-hash bits, sign → signature bit.
    */
  def simhash(text: String): Long = {
    val counts = new Array[Int](64)
    val t = if (text == null) "" else text.toLowerCase // null ≡ empty doc
    var i = 0
    val len = t.length
    while (i < len) {
      while (i < len && Character.isWhitespace(t.charAt(i))) i += 1
      if (i < len) {
        var h = 0xcbf29ce484222325L
        while (i < len && !Character.isWhitespace(t.charAt(i))) {
          h ^= t.charAt(i); h *= 0x100000001b3L; i += 1
        }
        h = splitmix(h)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** Random-hyperplane LSH bucket: sign pattern of `nPlanes` projections,
    * one vector pass. Plane components are hash-derived in [-1,1] from
    * (seed, plane, dim) — reproducible with no stored planes.
    */
  def hyperplaneBucket(vec: Array[Float], nPlanes: Int, seed: Int): Long = {
    val proj = new Array[Double](nPlanes)
    var j = 0
    val d = vec.length
    while (j < d) {
      val v = vec(j)
      if (v != 0.0f) {
        var m = 0
        while (m < nPlanes) {
          val h = splitmix(seed.toLong * 0x9e3779b97f4a7c15L + m * 0xc2b2ae3d27d4eb4fL + j)
          // map to [-1, 1): 53-bit mantissa fraction
          val comp = (h >>> 11).toDouble / (1L << 52).toDouble - 1.0
          proj(m) += v * comp
          m += 1
        }
      }
      j += 1
    }
    var key = 0L
    var m = 0
    while (m < nPlanes) { if (proj(m) >= 0) key |= (1L << m); m += 1 }
    key
  }

  /** Deterministic stand-in weight vector for the linear quality scorer:
    * w(b) = unsigned(splitmix64(seed + b)) mod 2001 − 1000 ∈ [−1000, 1000].
    * Integer weights keep the dot product exact on any engine; a trained
    * model's coefficients would be loaded here instead — the scoring path
    * ([[linearScore]]) is identical either way.
    */
  def qualityWeights(dim: Int, seed: Long): Array[Long] =
    Array.tabulate(dim)(b =>
      java.lang.Long.remainderUnsigned(splitmix(seed + b), 2001L) - 1000L)

  /** ASCII token character after lowercasing: [a-z0-9]. The feature-
    * hashing tokenizers are ASCII BY DEFINITION — it makes the engine and
    * the DuckDB oracle regex (`[a-z0-9][a-z0-9']*`) definitionally
    * identical rather than coincidentally equal on ASCII corpora (a
    * Unicode `isLetterOrDigit` here would silently diverge from the
    * replay on the first non-ASCII letter), and matches the ASCII
    * normalization of the published fasttext/CCNet-style quality filters
    * this path models. Non-ASCII letters act as token separators.
    */
  @inline private[graft] def isTokenChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  /** Linear classifier apply, one text pass: tokenize exactly like
    * `TextAnalysis.hashingTf` (ASCII letter/digit start — see
    * [[isTokenChar]] — apostrophe continuation, FNV-1a over the lowered
    * chars, signed-mod bucket) and sum the bucket weights. Returns
    * (score_raw, n_toks) — both exact integers.
    */
  def linearScore(text: String, weights: Array[Long]): (Long, Long) = {
    val dim = weights.length
    var score = 0L
    var n = 0L
    if (text != null) {
      val lower = text.toLowerCase
      var i = 0
      val len = lower.length
      while (i < len) {
        while (i < len && !isTokenChar(lower.charAt(i))) i += 1
        if (i < len) {
          var h = 0xcbf29ce484222325L
          while (i < len && (isTokenChar(lower.charAt(i)) ||
              lower.charAt(i) == '\'')) {
            h ^= lower.charAt(i); h *= 0x100000001b3L; i += 1
          }
          val b = ((h % dim) + dim) % dim
          score += weights(b.toInt)
          n += 1L
        }
      }
    }
    (score, n)
  }

  /** Exact cosine similarity, one fused pass. */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Content-defined chunk boundaries (FastCDC-family Gear hash,
    * windowless): walk the text once keeping h ← h·2 + G(c mod 256)
    * (mod 2⁶⁴, G = splitmix64 — the repo hash, so a 256-entry table in
    * any engine) and cut when the chunk is ≥ minLen AND h ≡ 0
    * (mod 2^maskBits), or at maxLen, or at end-of-text; h resets at
    * every cut so chunking is LOCAL — an insertion only reshapes the
    * chunks it touches, which is the property shingle/fixed-window
    * span dedup lacks. Alongside h the same pass folds the chunk's
    * FNV-1a digest (over c mod 256), emitted per chunk.
    *
    * Returns (start0, len, digest) per chunk, start0 0-based; empty
    * text → no chunks. Pure integer Long arithmetic (wrapping ≡
    * mod 2⁶⁴), replayed verbatim by the q206 recursive CTE.
    */
  def cdcChunks(text: String, minLen: Int, maxLen: Int,
      maskBits: Int): Array[(Int, Int, Long)] = {
    require(minLen >= 1 && maxLen >= minLen && maskBits >= 1)
    val FnvBasis = -3750763034362895579L // 0xcbf29ce484222325
    val FnvPrime = 1099511628211L
    val mask = (1L << maskBits) - 1
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]
    var h = 0L
    var d = FnvBasis
    var cs = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = (text.charAt(i) % 256).toLong
      h = h * 2 + splitmix64(c)
      d = (d ^ c) * FnvPrime
      val len = i - cs + 1
      val cut = (len >= minLen && (h & mask) == 0L) || len >= maxLen ||
        i == n - 1
      if (cut) {
        out += ((cs, len, d))
        h = 0L; d = FnvBasis; cs = i + 1
      }
      i += 1
    }
    out.toArray
  }
}
