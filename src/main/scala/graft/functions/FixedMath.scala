package graft.functions

import java.math.BigInteger

/** Cross-engine deterministic fixed-point math kernels.
  *
  * Why this exists: the driver's correctness gate hash-compares Spark
  * output against a DuckDB oracle **on a different machine/build**.
  * IEEE 754 guarantees correct rounding for `+ − × ÷ sqrt` only;
  * `ln`/`exp`/`pow` are libm calls whose last bits differ across libc
  * builds, and DuckDB's decimal-literal typing changed across versions
  * (`1.96` parses DOUBLE on 1.0.x but DECIMAL(3,2) on newer releases,
  * so `1.96*1.96` constant-folds to a *different* double). Any gated
  * column whose value passes through one of those ops can flip a
  * `floor(x·1e12)` quantization on the driver even though it is
  * bit-exact against the builder's local DuckDB — exactly what
  * happened to q156/q194/q196/q199 in round 9.
  *
  * The fix: make the gated value the output of an **integer-only
  * algorithm** specified here and replicated verbatim as a DuckDB
  * recursive CTE ([[lnCteSql]]/[[isqrtCteSql]]). Both engines then
  * agree by construction — no libm, no literal typing, no fold order.
  * Each kernel's Scala and SQL forms are asserted equal over a dense
  * domain in FixedMathSpec (SQL side replayed in
  * tools/check_oracle.py's DuckDB by the driver itself).
  *
  * Reference behavior anchor: the reference computes plain float
  * statistics with numpy (dabstract/utils.py summary paths) and never
  * cross-checks engines, so it has no analogue of this discipline;
  * the operators themselves (entropy, survival, Wilson) are standard
  * textbook forms.
  */
object FixedMath {

  /** floor(ln(2)·10^15) — the one scaling constant of [[lnQ12]]. */
  final val Ln2Q15 = 693147180559945L

  /** Fraction bits of the log2 bit-recurrence: v ∈ [2^62, 2^63), so
    * v² < 2^126 fits both BigInteger and DuckDB's signed HUGEINT.
    */
  final val LnScaleBits = 62

  private val TwoS: BigInteger = BigInteger.ONE.shiftLeft(LnScaleBits)
  private val TwoS1: BigInteger = BigInteger.ONE.shiftLeft(LnScaleBits + 1)
  private val LnCombineDen: BigInteger =
    TwoS.multiply(BigInteger.valueOf(1000L))
  private val Ln2Q15Big = BigInteger.valueOf(Ln2Q15)

  /** Fixed-point natural log: ≈ floor(ln(k)·10^12) for integer k ≥ 1,
    * computed by the classic bit-recurrence for log2 (normalize the
    * mantissa to [1,2) at scale 2^62, square 62 times, collect the
    * overflow bits) followed by one integer multiply by
    * floor(ln2·10^15)/1000. Every step is an integer op with floor
    * division, so any faithful reimplementation (the DuckDB CTE in
    * [[lnCteSql]]) produces the *same long* — the property the
    * correctness gate needs. Dominant truncation error is the
    * floor(ln2·10¹⁵) constant (≈0.31 per 10¹⁵) scaled by log2(k) ≤ 63
    * plus the 62-step recurrence floor noise: ≤ ~2·10⁻² of one 10⁻¹²
    * unit total, so the value is the mathematically correct floor
    * except within ~2·10⁻¹⁴ of a quantization boundary.
    */
  def lnQ12(k: Long): Long = {
    require(k >= 1L, s"lnQ12 domain is k >= 1, got $k")
    if (k == 1L) return 0L
    val p = 63 - java.lang.Long.numberOfLeadingZeros(k) // floor(log2 k)
    var v = BigInteger.valueOf(k).shiftLeft(LnScaleBits).shiftRight(p)
    var f = BigInteger.ZERO
    var i = 0
    while (i < LnScaleBits) {
      v = v.multiply(v).shiftRight(LnScaleBits)
      if (v.compareTo(TwoS1) >= 0) {
        f = f.shiftLeft(1).setBit(0)
        v = v.shiftRight(1)
      } else f = f.shiftLeft(1)
      i += 1
    }
    BigInteger.valueOf(p.toLong).shiftLeft(LnScaleBits).add(f)
      .multiply(Ln2Q15Big).divide(LnCombineDen).longValueExact()
  }

  /** Wilson-score lower bound as a 10⁻⁹ fixed-point long, z = 49/25
    * (= 1.96 exactly, as a rational — never a float literal). Derivation
    * from lb = (p̂ + z²/2n − z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n)
    * with p̂ = s/n, z² = 2401/625, multiplying through by exact
    * integers:
    *
    *   A  = 2500·s·(n−s) + 2401·n          (the radicand × 2500n³)
    *   R  = isqrt(2500·A·n · 10⁶)          (= √radicand·2500n²·10³, −1ulp)
    *   lb = (62500000·s·n + 120050000·n − 49·R)
    *          · 10⁹ / (100000·n·(625·n + 2401))   (floor)
    *
    * floor(√·) is a pure integer function (BigInteger.sqrt here, a
    * Newton CTE in [[isqrtCteSql]]), so both engines agree exactly.
    * The 10³ scale under the root keeps the result within 10⁻⁸ of the
    * real-valued bound; s=0 yields exactly 0 (the radicand becomes a
    * perfect square). HUGEINT headroom bounds the oracle side at
    * n ≤ 477,525,395 trials per group (worst case s = n/2 — exact
    * boundary asserted in FixedMathSpec; the q194 oracle carries a
    * loud guard); the engine side is arbitrary precision.
    */
  /** floor(√k) for k ≥ 0 — the standalone integer square root
    * ([[wilsonLbQ9]]'s inner step): BigInteger.sqrt here, the Newton
    * CTE of [[isqrtCteSql]] oracle-side; exact on both by definition
    * of the floor root.
    */
  def isqrt(k: Long): Long = {
    require(k >= 0L, s"isqrt domain is k >= 0, got $k")
    BigInteger.valueOf(k).sqrt().longValueExact()
  }

  def wilsonLbQ9(trials: Long, conversions: Long): Long = {
    require(trials >= 0 && conversions >= 0 && conversions <= trials,
      s"wilsonLbQ9 needs 0 <= conversions <= trials, got ($trials, $conversions)")
    if (trials == 0L) return 0L
    val n = BigInteger.valueOf(trials)
    val s = BigInteger.valueOf(conversions)
    val a = BigInteger.valueOf(2500L).multiply(s).multiply(n.subtract(s))
      .add(BigInteger.valueOf(2401L).multiply(n))
    val r = BigInteger.valueOf(2500L).multiply(a).multiply(n)
      .multiply(BigInteger.valueOf(1000000L)).sqrt()
    val t = BigInteger.valueOf(62500000L).multiply(s).multiply(n)
      .add(BigInteger.valueOf(120050000L).multiply(n))
      .subtract(BigInteger.valueOf(49L).multiply(r))
    val d = BigInteger.valueOf(100000L).multiply(n)
      .multiply(BigInteger.valueOf(625L).multiply(n)
        .add(BigInteger.valueOf(2401L)))
    t.multiply(BigInteger.valueOf(1000000000L)).divide(d).longValueExact()
  }

  // ---------------------------------------------------------------
  // DuckDB replicas — appended inside a WITH RECURSIVE list. Naming
  // contract: the query supplies `_ks(k)` (distinct BIGINT k >= 1)
  // before this fragment and reads `_lnq(k, l)` after it; resp.
  // `_sa(id, a)` (HUGEINT a >= 0) and `_isq(id, r)`.
  // ---------------------------------------------------------------

  /** DuckDB fragment computing `_lnq(k, l)` = [[lnQ12]] over `_ks(k)`.
    * 4611686018427387904 = 2^62; the HUGEINT literal '92233…808' = 2^63
    * (one past BIGINT max, hence the string cast). `_pw` builds exact
    * powers of two by doubling — no float log2 anywhere.
    */
  val lnCteSql: String =
    """_pw AS (SELECT 0 AS pp, CAST(1 AS HUGEINT) AS w
      |  UNION ALL SELECT pp+1, w*2 FROM _pw WHERE pp < 64),
      |_kp AS (SELECT k, MAX(pp) AS p FROM _ks
      |  JOIN _pw ON w <= CAST(k AS HUGEINT) GROUP BY k),
      |_it AS (
      |  SELECT kp.k, kp.p, 0 AS i,
      |    (CAST(kp.k AS HUGEINT) * CAST(4611686018427387904 AS HUGEINT)) // pw.w AS v,
      |    CAST(0 AS HUGEINT) AS f
      |  FROM _kp kp JOIN _pw pw ON pw.pp = kp.p
      |  UNION ALL
      |  SELECT k, p, i,
      |    CASE WHEN v1 >= CAST('9223372036854775808' AS HUGEINT)
      |      THEN v1 // 2 ELSE v1 END,
      |    CASE WHEN v1 >= CAST('9223372036854775808' AS HUGEINT)
      |      THEN f*2 + 1 ELSE f*2 END
      |  FROM (SELECT k, p, i+1 AS i,
      |          (v*v) // CAST(4611686018427387904 AS HUGEINT) AS v1, f
      |        FROM _it WHERE i < 62)),
      |_lnq AS (
      |  SELECT k, CAST(((CAST(p AS HUGEINT) * CAST(4611686018427387904 AS HUGEINT) + f)
      |    * 693147180559945) // (CAST(4611686018427387904 AS HUGEINT) * 1000) AS BIGINT) AS l
      |  FROM _it WHERE i = 62)""".stripMargin

  /** DuckDB fragment computing `_isq(id, r)` = floor(√a) over
    * `_sa(id, a)`: Newton iteration from a//2+1 (provably decreasing
    * to the floor root), fixed 140-step cap, ±1 correction at the end
    * so any off-by-one from the stop condition is repaired. Caller
    * keeps a ≲ 10^38 (HUGEINT) — the (x+1)² probe needs the headroom.
    */
  val isqrtCteSql: String =
    """_sq AS (
      |  SELECT id, a, CASE WHEN a < 2 THEN a ELSE a // 2 + 1 END AS x, 0 AS i FROM _sa
      |  UNION ALL
      |  SELECT id, a, (x + a // x) // 2, i + 1
      |  FROM _sq WHERE i < 140 AND x > 0 AND (x + a // x) // 2 < x),
      |_sr AS (SELECT id, a, MIN(x) AS x FROM _sq GROUP BY id, a),
      |_isq AS (
      |  SELECT id, CASE WHEN x > 0 AND x*x > a THEN x - 1
      |                  WHEN (x+1)*(x+1) <= a THEN x + 1
      |                  ELSE x END AS r
      |  FROM _sr)""".stripMargin
}
