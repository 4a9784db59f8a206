package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Systematic PPS sampling: pin-count parity with a direct driver-side
  * replay, the Σ n_hits = n invariant, and the structural guarantees
  * (zero weights never selected, heavy docs always selected, seeded
  * determinism).
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(nDocs: Int) = {
    // deterministic uneven weights incl. zeros and one heavy outlier
    (0 until nDocs).map { i =>
      val w = if (i % 17 == 0) 0L else ((i * 37 % 211) + 1).toLong
      (i.toLong, if (i == 42) 50000L else w)
    }.toDF("doc_id", "w")
  }

  /** Direct replay: place docs in seeded md5 order, count pins per doc
    * with BigInt arithmetic — the definition, independent of the
    * engine's prefix-sum/DIV formulation.
    */
  private def replay(rows: Seq[(Long, Long)], n: Long, seed: Long): Map[Long, Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def ord(id: Long): Long = {
      val hex = md.digest(s"$seed#$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val placed = rows.sortBy { case (id, _) => (ord(id), id) }
    val wTotal = BigInt(placed.map(_._2).sum)
    var cBefore = BigInt(0)
    val out = scala.collection.mutable.Map.empty[Long, Long]
    placed.foreach { case (id, w) =>
      val cAfter = cBefore + w
      // pins at (2j+1)·W / (2n), j = 0..n-1, hit iff cBefore ≤ pin < cAfter
      val hits = (0L until n).count { j =>
        val lhs = BigInt(2 * j + 1) * wTotal
        lhs >= cBefore * 2 * n && lhs < cAfter * 2 * n
      }
      if (hits > 0) out(id) = hits
      cBefore = cAfter
    }
    out.toMap
  }

  test("empty and all-zero-weight inputs return empty, not NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "w")
    assert(graft.operators.Sampling
      .ppsSystematic(empty, 5, "w").count() == 0L)
    val zeros = Seq((1L, 0L), (2L, 0L)).toDF("doc_id", "w")
    assert(graft.operators.Sampling
      .ppsSystematic(zeros, 5, "w").count() == 0L)
  }

  test("pin counts match the direct BigInt replay exactly") {
    val df = corpus(300)
    val got = Sampling.ppsSystematic(df, n = 40, weightCol = "w", seed = 7)
      .select("doc_id", "n_hits").as[(Long, Long)].collect().toMap
    val want = replay(df.as[(Long, Long)].collect().toSeq, n = 40, seed = 7)
    assert(got == want)
  }

  test("sum of hits is exactly n; zero-weight docs never selected") {
    val df = corpus(300)
    val res = Sampling.ppsSystematic(df, n = 57, weightCol = "w", seed = 3)
      .join(df, Seq("doc_id"))
    assert(res.agg(sum("n_hits")).head.getLong(0) == 57L)
    assert(res.filter(col("w") === 0L).count() == 0L)
  }

  test("a doc with weight ≥ W/n is always selected (heavy outlier)") {
    val df = corpus(300)
    val sel = Sampling.ppsSystematic(df, n = 57, weightCol = "w", seed = 11)
      .select("doc_id").as[Long].collect().toSet
    assert(sel.contains(42L)) // 50000 ≥ W/57 by construction
  }

  test("same seed reproduces; different seed moves the sample") {
    val df = corpus(200)
    def ids(seed: Long) =
      Sampling.ppsSystematic(df, n = 30, weightCol = "w", seed = seed)
        .select("doc_id").as[Long].collect().toSet
    assert(ids(5) == ids(5))
    assert(ids(5) != ids(6))
  }

  test("budgetSample: exactly k rows, Hamilton quotas within 1 of proportional, deterministic") {
    // strata 70 / 25 / 5 → exact shares of k=20: 14 / 5 / 1
    val docs = ((1 to 70).map(i => ("web", i.toLong)) ++
      (71 to 95).map(i => ("book", i.toLong)) ++
      (96 to 100).map(i => ("code", i.toLong))).toDF("source", "doc_id")
    val got = Sampling.budgetSample(docs, k = 20L)
      .as[(String, Long, Long, Long)].collect()
    assert(got.length == 20)
    val byStratum = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byStratum == Map("web" -> 14, "book" -> 5, "code" -> 1))
    // quota column is consistent with the realized counts
    assert(got.forall(r => byStratum(r._1).toLong == r._4))
    // pick ranks dense per stratum
    assert(got.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._3).sorted.toSeq == (1L to rs.length) })
    // deterministic: the same call returns the same ids
    val again = Sampling.budgetSample(docs, k = 20L)
      .as[(String, Long, Long, Long)].collect()
    assert(got.sortBy(r => (r._1, r._3)).toSeq ==
      again.sortBy(r => (r._1, r._3)).toSeq)
    // fractional shares: 3/3/3 over k=2 → largest remainders (ties by
    // stratum name) pick the lexicographically first two strata
    val even = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 4L), ("b", 5L),
      ("b", 6L), ("c", 7L), ("c", 8L), ("c", 9L)).toDF("source", "doc_id")
    val picks = Sampling.budgetSample(even, k = 2L)
      .as[(String, Long, Long, Long)].collect().map(_._1).sorted.toSeq
    assert(picks == Seq("a", "b"))
    // k > N refuses loudly
    intercept[IllegalArgumentException] {
      Sampling.budgetSample(even, k = 10L).collect()
    }
  }

  test("domainMixturePlan: floor rates, downsample-only cap, achieved mix") {
    // A: 600 tokens, B: 400; targets A 250permille / B 750permille.
    // rate_A = floor(250*1000*1e6 / (1000*600)) = 416666 -> kept 249;
    // rate_B caps at 1e6 -> kept 400; achieved = 383 / 616 permille.
    val docs = Seq(("A", 200L), ("A", 200L), ("A", 200L),
      ("B", 150L), ("B", 250L)).toDF("source", "n_chars")
    val got = Sampling.domainMixturePlan(docs,
        Seq("A" -> 250L, "B" -> 750L))
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long)].collect().toList
    assert(got == List(
      ("A", 600L, 250L, 416666L, 249L, 383L),
      ("B", 400L, 750L, 1000000L, 400L, 616L)))
    // a domain absent from the targets is dropped from the plan
    val withC = docs.union(Seq(("C", 100L)).toDF("source", "n_chars"))
    assert(Sampling.domainMixturePlan(withC,
      Seq("A" -> 250L, "B" -> 750L)).count() == 2L)
  }

  test("temperatureMixturePlan: alpha=1/2 flattens exactly (floor-isqrt weights, Q6 shares)") {
    // A: 100 toks (w=10), B: 900 toks (w=30). Raw 10%/90% flattens to
    // 25%/75% — the sqrt-temper head-flattening, all exact integers.
    val docs = Seq(("A", 100L), ("B", 900L))
      .toDF("source", "n_chars")
    val got = Sampling.temperatureMixturePlan(docs).orderBy("source")
      .as[(String, Long, Long, Long, Long)].collect().toList
    assert(got == List(
      ("A", 100L, 100000L, 10L, 250000L),
      ("B", 900L, 900000L, 30L, 750000L)))
    // non-square counts floor: w = isqrt(10) = 3
    val odd = Seq(("C", 10L)).toDF("source", "n_chars")
    val c = Sampling.temperatureMixturePlan(odd)
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(c == (("C", 10L, 1000000L, 3L, 1000000L)))
  }

  test("temperatureSweep: iterated-floor weights exact by hand; head share falls monotonically") {
    // A: 10000 toks, B: 16. Weights down the grid:
    //   α=1:    A 10000, B 16  → head 10000e6 DIV 10016 = 998402
    //   α=1/2:  A 100,   B 4   → head 100e6 DIV 104     = 961538
    //   α=1/4:  A 10,    B 2   → head  10e6 DIV 12      = 833333
    //   α=1/8:  A 3,     B 1   → head   3e6 DIV 4       = 750000
    // (A at 1/8 is ⌊√10⌋ = 3 — the nested-floor identity ⌊√⌊√x⌋⌋,
    // not round(10000^0.125) = 3.16 → 3; B's ⌊√2⌋ = 1.)
    val docs = Seq(("A", 10000L), ("B", 16L)).toDF("source", "n_chars")
    val got = Sampling.temperatureSweep(docs)
      .orderBy(col("alpha_q3").desc, col("source"))
      .as[(Long, String, Long, Long, Long, Long)].collect().toList
    assert(got == List(
      (1000L, "A", 10000L, 10000L, 998402L, 998402L),
      (1000L, "B", 16L, 16L, 1597L, 998402L),
      (500L, "A", 10000L, 100L, 961538L, 961538L),
      (500L, "B", 16L, 4L, 38461L, 961538L),
      (250L, "A", 10000L, 10L, 833333L, 833333L),
      (250L, "B", 16L, 2L, 166666L, 833333L),
      (125L, "A", 10000L, 3L, 750000L, 750000L),
      (125L, "B", 16L, 1L, 250000L, 750000L)))
    // the curve a curator reads: dominance falls as α drops
    val heads = got.map(r => r._1 -> r._6).distinct.sortBy(-_._1).map(_._2)
    assert(heads == heads.sorted.reverse && heads.distinct == heads)
    // off-grid α rejected loudly (only halvings are exactly computable)
    assertThrows[IllegalArgumentException] {
      Sampling.temperatureSweep(docs, alphasQ3 = Seq(333L))
    }
  }
}
