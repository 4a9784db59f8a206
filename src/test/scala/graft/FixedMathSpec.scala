package graft

import java.math.BigInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FixedMath

/** The load-bearing property of the whole FixedMath layer: the Scala
  * kernels and the DuckDB recursive-CTE replicas compute the SAME
  * integers. DuckDB isn't callable from this JVM, so the CTE side is
  * validated by a pure-Scala REPLAY that mirrors the SQL text
  * step-for-step (same floor divisions, same iteration counts, same
  * combine) while asserting every intermediate fits signed HUGEINT —
  * i.e. the replay proves the algorithm the SQL spells out (a) is the
  * Scala kernel and (b) never overflows the 128-bit type it runs in.
  * The end-to-end DuckDB execution of the same text is exercised by
  * the driver's oracle gate (q194/q196/q199/q201).
  */
class FixedMathSpec extends AnyFunSuite {

  private val HugeMax = BigInteger.ONE.shiftLeft(127).subtract(BigInteger.ONE)
  private def huge(x: BigInteger, what: String): BigInteger = {
    assert(x.abs.compareTo(HugeMax) <= 0, s"HUGEINT overflow in $what: $x")
    x
  }
  private val Two62 = BigInteger.ONE.shiftLeft(62)
  private val Two63 = BigInteger.ONE.shiftLeft(63)

  /** Literal replay of [[FixedMath.lnCteSql]]: _pw doubling powers,
    * _kp max-power join, 62 _it squaring steps with the ≥2^63
    * renormalization, the _lnq combine — floor division throughout.
    */
  private def lnQ12CteReplay(k: Long): Long = {
    require(k >= 1L)
    // _pw/_kp: p = max pp with 2^pp <= k (doubling, no float log2)
    var p = 0
    while (p < 64 && BigInteger.ONE.shiftLeft(p + 1)
        .compareTo(BigInteger.valueOf(k)) <= 0) p += 1
    // _it seed: v = (k * 2^62) // 2^p
    var v = huge(BigInteger.valueOf(k).multiply(Two62), "seed mult")
      .divide(BigInteger.ONE.shiftLeft(p))
    var f = BigInteger.ZERO
    var i = 0
    while (i < 62) {
      val v1 = huge(v.multiply(v), "v*v").divide(Two62)
      if (v1.compareTo(Two63) >= 0) {
        v = v1.divide(BigInteger.TWO)
        f = f.multiply(BigInteger.TWO).add(BigInteger.ONE)
      } else {
        v = v1
        f = f.multiply(BigInteger.TWO)
      }
      i += 1
    }
    // _lnq combine
    val num = huge(BigInteger.valueOf(p.toLong).multiply(Two62).add(f)
      .multiply(BigInteger.valueOf(FixedMath.Ln2Q15)), "combine")
    num.divide(Two62.multiply(BigInteger.valueOf(1000L))).longValueExact()
  }

  /** Literal replay of [[FixedMath.isqrtCteSql]]: Newton from a//2+1,
    * stop when the next iterate stops decreasing, 140-step cap, ±1
    * repair — asserting the (x+1)² probe stays in HUGEINT.
    */
  private def isqrtCteReplay(a: BigInteger): BigInteger = {
    require(a.signum >= 0)
    huge(a, "a")
    var x = if (a.compareTo(BigInteger.TWO) < 0) a
      else a.divide(BigInteger.TWO).add(BigInteger.ONE)
    var i = 0
    var continue = x.signum > 0
    while (continue && i < 140) {
      val nxt = x.add(a.divide(x)).divide(BigInteger.TWO)
      if (nxt.compareTo(x) < 0) { x = nxt; i += 1 } else continue = false
    }
    // _isq ±1 repair
    if (x.signum > 0 && huge(x.multiply(x), "x*x").compareTo(a) > 0)
      x.subtract(BigInteger.ONE)
    else if (huge(x.add(BigInteger.ONE).multiply(x.add(BigInteger.ONE)),
        "(x+1)^2").compareTo(a) <= 0)
      x.add(BigInteger.ONE)
    else x
  }

  private def lnDomain: Seq[Long] = {
    val dense = (1L to 100000L)
    val powerEdges = (1 to 62).flatMap { b =>
      val p = 1L << b; Seq(p - 1, p, p + 1)
    }.filter(_ >= 1L)
    val bigEdges = Seq(Long.MaxValue, Long.MaxValue - 1, 999999999999999999L,
      1000000000000000000L, 4803839602528529L)
    val rng = new scala.util.Random(1012)
    val randomLarge = Seq.fill(2000)(math.abs(rng.nextLong()) max 1L)
    (dense ++ powerEdges ++ bigEdges ++ randomLarge).distinct
  }

  test("lnQ12 == CTE replay over a dense domain + power-of-two and BIGINT edges") {
    lnDomain.foreach { k =>
      assert(FixedMath.lnQ12(k) == lnQ12CteReplay(k), s"k=$k")
    }
  }

  test("lnQ12: monotone, exact anchors, floor-of-ln bounds") {
    assert(FixedMath.lnQ12(1L) == 0L)
    // floor(ln2 * 1e12) = 693147180559 — the constant's own scale
    assert(FixedMath.lnQ12(2L) == 693147180559L)
    var prev = Long.MinValue
    (1L to 100000L).foreach { k =>
      val v = FixedMath.lnQ12(k)
      assert(v >= prev, s"monotonicity broke at k=$k")
      prev = v
      // within the documented ~2e-2-unit truncation of floor(ln(k)*1e12)
      val real = math.log(k.toDouble) * 1e12
      assert(v <= real + 0.01 && v >= real - 1.5,
        s"k=$k: lnQ12=$v vs ln*1e12=$real")
    }
    // spot large-k bound (double ln noise dominates the tolerance)
    Seq(1L << 40, 1L << 62, Long.MaxValue).foreach { k =>
      val v = FixedMath.lnQ12(k).toDouble
      assert(math.abs(v / 1e12 - math.log(k.toDouble)) < 1e-9, s"k=$k")
    }
  }

  test("isqrt CTE replay: exact floor sqrt on 10^6 values + HUGEINT-edge magnitudes") {
    (0L to 1000000L).foreach { a =>
      val big = BigInteger.valueOf(a)
      assert(isqrtCteReplay(big) == big.sqrt(), s"a=$a")
    }
    // perfect squares ±1 at growing magnitudes up to the HUGEINT cap
    // (the (x+1)^2 probe needs r+1 squarable: keep a < (2^63.5)^2-ish)
    val rng = new scala.util.Random(77)
    (1 to 400).foreach { _ =>
      val r = new BigInteger(62, rng.self).add(BigInteger.ONE)
      val sq = r.multiply(r)
      Seq(sq.subtract(BigInteger.ONE), sq, sq.add(BigInteger.ONE)).foreach {
        a =>
          assert(isqrtCteReplay(a) == a.sqrt(), s"a=$a")
      }
    }
  }

  test("wilsonLbQ9 == SQL-form replay over a (trials, conversions) grid") {
    // replays the oracle's arithmetic: same A/R/lb integer pipeline
    // with R from the Newton-CTE replay instead of BigInteger.sqrt
    def replay(n0: Long, s0: Long): Long = {
      if (n0 == 0L) return 0L
      val n = BigInteger.valueOf(n0); val s = BigInteger.valueOf(s0)
      val a = BigInteger.valueOf(2500L).multiply(s).multiply(n.subtract(s))
        .add(BigInteger.valueOf(2401L).multiply(n))
      val rad = huge(BigInteger.valueOf(2500L).multiply(a).multiply(n)
        .multiply(BigInteger.valueOf(1000000L)), "radicand")
      val r = isqrtCteReplay(rad)
      val t = BigInteger.valueOf(62500000L).multiply(s).multiply(n)
        .add(BigInteger.valueOf(120050000L).multiply(n))
        .subtract(BigInteger.valueOf(49L).multiply(r))
      val d = BigInteger.valueOf(100000L).multiply(n)
        .multiply(BigInteger.valueOf(625L).multiply(n)
          .add(BigInteger.valueOf(2401L)))
      t.multiply(BigInteger.valueOf(1000000000L)).divide(d).longValueExact()
    }
    for (n <- 1L to 200L; s <- 0L to n)
      assert(FixedMath.wilsonLbQ9(n, s) == replay(n, s), s"($n, $s)")
    // exact oracle HUGEINT ceiling: worst-case radicand (s = n/2)
    // fits iff n <= 477525395 — probe AT the boundary
    val nMax = 477525395L
    val edges = Seq((nMax, 0L), (nMax, nMax), (nMax, nMax / 2),
      (400000000L, 123456789L), (1000000L, 999999L), (1000000L, 1L))
    edges.foreach { case (n, s) =>
      assert(FixedMath.wilsonLbQ9(n, s) == replay(n, s), s"($n, $s)")
    }
  }

  test("wilsonLbQ9: range and ordering sanity") {
    assert(FixedMath.wilsonLbQ9(0L, 0L) == 0L)
    assert(FixedMath.wilsonLbQ9(10L, 0L) == 0L)
    for (n <- Seq(10L, 100L, 1000L); s <- 0L to n by (n / 10)) {
      val lb = FixedMath.wilsonLbQ9(n, s)
      assert(lb >= 0L && lb <= 1000000000L, s"($n, $s) lb=$lb")
      assert(lb <= s * 1000000000L / n + 1, s"($n, $s): lb above p-hat")
    }
    // more evidence at same rate tightens the bound
    assert(FixedMath.wilsonLbQ9(1000L, 900L) > FixedMath.wilsonLbQ9(10L, 9L))
  }
}
