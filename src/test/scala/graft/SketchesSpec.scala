package graft

import graft.operators.{Analytics, Sketches, Validation}
import org.apache.spark.sql.functions._

/** Sketch algebra (HLL merge associativity, CMS superset property),
  * estimate accuracy in the raw regime, constraint-suite semantics, and
  * SCD2 validity chains — q141–q145 exercise the same paths against the
  * DuckDB replay at scale.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("hll: merged shard sketches equal the whole-corpus sketch exactly") {
    val all = (1L to 5000L).toDF("v").withColumn("g", lit("a"))
    val s1 = (1L to 3000L).toDF("v").withColumn("g", lit("a"))
    val s2 = (2000L to 5000L).toDF("v").withColumn("g", lit("a"))
    val whole = Sketches.hllRegisters(all, Seq("g"), "v")
    val merged = Sketches.hllMerge(
      Seq(Sketches.hllRegisters(s1, Seq("g"), "v"),
        Sketches.hllRegisters(s2, Seq("g"), "v")), Seq("g"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
    val Seq(eW) = Sketches.hllEstimate(whole, Seq("g"))
      .select("est").as[Long].collect().toSeq
    val Seq(eM) = Sketches.hllEstimate(merged, Seq("g"))
      .select("est").as[Long].collect().toSeq
    assert(eW == eM)
  }

  test("hll: raw-regime estimate lands within 4 standard errors") {
    // n = 20000 >> 2.5m = 640: raw regime; se ≈ 1.04/√256 ≈ 6.5%
    val df = (1L to 20000L).toDF("v").withColumn("g", lit("a"))
    val row = Sketches.hllEstimate(
      Sketches.hllRegisters(df, Seq("g"), "v"), Seq("g"))
      .select("est", "small_range").as[(Long, Boolean)].collect().head
    assert(!row._2, "20k distinct must clear the small-range fence")
    assert(math.abs(row._1 - 20000.0) / 20000.0 < 4 * 1.04 / 16,
      s"est ${row._1} too far from 20000")
  }

  test("hll: small-range flag trips when n << m") {
    val df = (1L to 20L).toDF("v").withColumn("g", lit("a"))
    val row = Sketches.hllEstimate(
      Sketches.hllRegisters(df, Seq("g"), "v"), Seq("g"))
      .select("small_range").as[Boolean].collect().head
    assert(row, "20 distinct over 256 registers is linear-counting range")
  }

  test("cms: estimate never undercounts, and merge is additive") {
    val items = ((1L to 50L).flatMap(i => Seq.fill(20)(i)) ++
      (1000L to 1400L)).toDF("item")
    val counters = Sketches.cmsCounters(items, "item")
    val est = Sketches.cmsEstimate(counters,
        items.select("item").distinct(), "item")
      .as[(Long, Long)].collect().toMap
    (1L to 50L).foreach(i => assert(est(i) >= 20, s"undercount at $i"))
    (1000L to 1400L).foreach(i => assert(est(i) >= 1))
    // merged shard counters ≡ whole counters (sum is associative);
    // split deterministically by value
    val a = items.filter(col("item") <= 40)
    val b = items.filter(col("item") > 40)
    val merged = Sketches.cmsMerge(
      Seq(Sketches.cmsCounters(a, "item"), Sketches.cmsCounters(b, "item")))
    val whole = counters
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }

  test("heavy hitters: exact counts above a relative threshold, no extras") {
    // 3 hot items (100×), 200 cold (1×): total 500; n·5 ≥ 500 ⇔ n ≥ 100
    val items = ((1L to 3L).flatMap(i => Seq.fill(100)(i)) ++
      (101L to 300L)).toDF("item")
    val got = Sketches.heavyHitters(items, "item", relDen = 5L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 100L, 2L -> 100L, 3L -> 100L))
  }

  test("hll: streaming register state equals the batch sketch across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val regs = Sketches.hllRegisters(
      input.toDF().toDF("g", "v"), Seq("g"), "v")
    val q = regs.writeStream.format("memory").queryName("hll_sink")
      .outputMode("complete").start()
    try {
      input.addData((1L to 400L).map(i => ("a", i)): _*)
      q.processAllAvailable()
      input.addData((300L to 900L).map(i => ("a", i)): _*) // overlap merges
      q.processAllAvailable()
      val streamed = spark.table("hll_sink")
      val batch = Sketches.hllRegisters(
        (1L to 900L).map(i => ("a", i)).toDF("g", "v"), Seq("g"), "v")
      assert(batch.exceptAll(streamed).isEmpty &&
        streamed.exceptAll(batch).isEmpty)
    } finally q.stop()
  }

  test("hll trailing window: day-d registers equal the window's direct sketch") {
    // days 10..13, values disjoint per day; window 3 → day 12 covers 10..12
    val df = (10L to 13L).flatMap(d =>
      (d * 1000 to d * 1000 + 99).map(v => (d, v))).toDF("day", "v")
    val regs = Sketches.hllRegisters(df, Seq("day"), "v")
    val win = Sketches.hllTrailingRegisters(regs, "day", windowDays = 3,
      validDays = df.select("day").distinct())
    val d12 = win.filter(col("day") === 12).drop("day")
    val direct = Sketches.hllRegisters(
      df.filter(col("day").between(10, 12)).withColumn("g", lit(1)),
      Seq("g"), "v").drop("g")
    assert(d12.exceptAll(direct).isEmpty && direct.exceptAll(d12).isEmpty)
    assert(win.select("day").distinct().count() == 4, "only real days emitted")
  }

  test("hll native aggregate: bit-identical to the table formulation") {
    // 8 partitions force real partial/final merges + buffer serialization
    val df = spark.range(1, 40001).toDF("v").repartition(8)
      .withColumn("g", (col("v") % 3).cast("string"))
    val table = Sketches.hllEstimate(
        Sketches.hllRegisters(df, Seq("g"), "v"), Seq("g"))
      .orderBy("g")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    val native = df.groupBy("g")
      .agg(graft.plans.GraftExtensions.hllNative(col("v")).as("_h"))
      .select(col("g"), col("_h.n_set"), col("_h.est"), col("_h.small_range"))
      .orderBy("g")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(native == table)
    assert(native.forall(r => !r._4), "13k+ distinct per group is raw regime")
  }

  test("kmvQuantiles: exact below k, ~rank-sigma above, partitioning-invariant") {
    import graft.operators.Sketches
    // exact regime: 9 distinct values < k — quantiles are the exact
    // distinct-value order statistics at ⌈q·9/100⌉
    val small = Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L, 80L, 90L, 10L, 20L)
      .toDF("v")
    val ex = Sketches.kmvQuantiles(small, "v", k = 256)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(ex == ((9L, 30L, 50L, 70L, 90L)))
    // sampling regime: 20k distinct uniform values, k = 256 → the rank
    // estimator's sigma is sqrt(q(1-q)/m)·range; assert within 4 sigma
    val big = spark.range(1, 20001).toDF("v")
    val (m, q25, q50, q75, q90) = Sketches.kmvQuantiles(big, "v", k = 256)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(m == 256L)
    def sigma(q: Double) = math.sqrt(q * (1 - q) / 256) * 20000
    assert(math.abs(q50 - 10000) < 4 * sigma(0.5), s"q50=$q50")
    assert(math.abs(q25 - 5000) < 4 * sigma(0.25), s"q25=$q25")
    assert(math.abs(q75 - 15000) < 4 * sigma(0.75), s"q75=$q75")
    assert(math.abs(q90 - 18000) < 4 * sigma(0.9), s"q90=$q90")
    // the selection is pure hash order — identical under any layout
    val r1 = Sketches.kmvQuantiles(big.repartition(1), "v", k = 256)
      .as[(Long, Long, Long, Long, Long)].head()
    val r64 = Sketches.kmvQuantiles(big.repartition(64), "v", k = 256)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r1 == r64 && r1 == ((m, q25, q50, q75, q90)))
  }

  test("kmv: exact below k, ~1/sqrt(k) above, partitioning-invariant") {
    import graft.plans.GraftExtensions.kmvNative
    // below k: the sketch IS the distinct set
    val small = spark.range(0, 100).toDF("v").repartition(7)
      .agg(kmvNative(col("v"), 256).as("_k"))
      .select("_k.n_state", "_k.est").head
    assert(small.getLong(0) == 100L && small.getLong(1) == 100L)
    // above k: 20000 distinct, 3σ ≈ 3/√256 ≈ 18.75%
    val big = spark.range(0, 60000).select((col("id") % 20000).as("v"))
    val est = big.repartition(8).agg(kmvNative(col("v"), 256).as("_k"))
      .select("_k.est").head.getLong(0)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.2, s"est=$est")
    // merge order / partitioning cannot change the k minima
    val one = big.repartition(1).agg(kmvNative(col("v"), 256).as("_k"))
      .select("_k.n_state", "_k.est").head
    val many = big.repartition(37).agg(kmvNative(col("v"), 256).as("_k"))
      .select("_k.n_state", "_k.est").head
    assert(one == many)
  }

  test("kmv stream: cross-batch state merge equals the batch aggregate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val streamed = graft.streaming.EventStreams.kmvStream(spark,
      input.toDF().toDF("event_type", "user_id"), k = 64)
    val q = streamed.writeStream.format("memory").queryName("kmv_conv")
      .outputMode("append").start()
    try {
      input.addData((1L to 300L).map(i => ("x", i * 7)): _*)
      q.processAllAvailable()
      input.addData((1L to 300L).map(i => ("x", i * 3)): _*) // overlaps at 21k
      q.processAllAvailable()
      val fin = spark.table("kmv_conv").orderBy(col("emit").desc).limit(1)
        .select(graft.plans.GraftExtensions.kmvEstimateNative(col("mins"), 64)
          .as("_e"))
        .select("_e.n_state", "_e.est").head
      val batch = ((1L to 300L).map(_ * 7) ++ (1L to 300L).map(_ * 3))
        .toDF("v")
        .agg(graft.plans.GraftExtensions.kmvNative(col("v"), 64).as("_k"))
        .select("_k.n_state", "_k.est").head
      assert(fin == batch)
    } finally q.stop()
  }

  test("plan shapes: register table is one exchange; screen joins broadcast") {
    val df = (1L to 1000L).toDF("v").withColumn("g", lit("a"))
    val regPlan = Sketches.hllRegisters(df, Seq("g"), "v")
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(regPlan).size == 1,
      s"register build must be exactly one partial-agg'd shuffle:\n${regPlan.take(800)}")
    val hhPlan = Sketches.heavyHitters(df, "v", relDen = 2L)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin .*LeftSemi".r.findFirstIn(hhPlan).nonEmpty,
      s"exact verify must semi-join against the BROADCAST screened set:\n${hhPlan.take(800)}")
  }

  test("constraint report: one row per constraint, exact pass/fail") {
    val docs = Seq(
      (1L, "hello world", "en", 11L),
      (2L, "guten tag", "de", 9L),
      (3L, null.asInstanceOf[String], "xx", -1L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val got = Validation.constraintReport(docs,
        Validation.documentSuite(Seq("en", "de")))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("complete_text") == ((2L, 3L, false)))
    assert(got("unique_doc_id") == ((3L, 3L, true)))
    assert(got("nonneg_n_chars") == ((2L, 3L, false)))
    assert(got("lang_in_domain") == ((2L, 3L, false)))
    assert(got("text_nonempty") == ((2L, 3L, false)))
    assert(got("sum_chars_floor") == ((19L, 300L, false)))
  }

  test("benford audit: hand-computed digits and integer deviations; zero/negative rows excluded") {
    // one value per leading digit (incl. a sub-1 value whose first
    // SIGNIFICANT digit is 5) + excluded zero/negative rows
    val vals = Seq(12.34, 210.0, 3.0, 4999.99, 0.05, 61.0, 7.77, 80.0, 9.0,
      0.0, -55.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val got = Validation.benfordAudit(df, "v")
      .as[(Int, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == (1 to 9).toSet)
    val permille = Map(1 -> 301L, 2 -> 176L, 3 -> 125L, 4 -> 97L, 5 -> 79L,
      6 -> 67L, 7 -> 58L, 8 -> 51L, 9 -> 46L)
    for (d <- 1 to 9) {
      // every digit observed exactly once; N = 9 (zero/neg excluded)
      assert(got(d) == ((1L, permille(d), 1000L - permille(d) * 9L)), s"digit $d")
    }
    // a digit with no observations still reports, with n_obs = 0
    val sparse = Seq((1L, 12.0), (2L, 13.0)).toDF("id", "v")
    val g2 = Validation.benfordAudit(sparse, "v")
      .as[(Int, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._4))).toMap
    assert(g2(1) == ((2L, 2000L - 301L * 2L)))
    assert(g2(9) == ((0L, -46L * 2L)))
  }

  test("constraint report by group: pass/fail independent per segment") {
    val docs = Seq(
      (1L, "hello there world", "en", 17L, "good"),
      (2L, "guten tag", "de", 9L, "good"),
      (3L, null.asInstanceOf[String], "en", 5L, "bad"),
      (4L, "bonjour", "fr", 7L, "bad"))
      .toDF("doc_id", "text", "lang", "n_chars", "source")
    val got = Validation.constraintReportBy(docs, Seq("source"),
        Validation.documentSuite(Seq("en", "de", "fr")))
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> r._5).toMap
    assert(got(("good", "complete_text")) && !got(("bad", "complete_text")))
    assert(got(("good", "unique_doc_id")) && got(("bad", "unique_doc_id")))
  }

  test("scd2 merge: validity chains link, current row open-ended") {
    val base = Seq((1L, "A", 0L), (2L, "B", 0L)).toDF("k", "attr", "ver")
    val upd = Seq((1L, "C", 10L), (1L, "D", 20L)).toDF("k", "attr", "ver")
    val got = Validation.scd2Merge(base, upd, "k", Seq("attr"), "ver")
      .orderBy("k", "valid_from")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, "A", 0L, Some(10L), false),
      (1L, "C", 10L, Some(20L), false),
      (1L, "D", 20L, None, true),
      (2L, "B", 0L, None, true)))
  }

  test("ks drift: hand-computed two-sample statistic, exact numerator") {
    // s1 = {1,2,3,4}, s2 = {3,4,5,6}: D = 2/4 at v=2
    val df = (Seq((1.0, 0), (2.0, 0), (3.0, 0), (4.0, 0)) ++
      Seq((3.0, 1), (4.0, 1), (5.0, 1), (6.0, 1))).toDF("value", "f")
    val got = Analytics.ksDrift(df, "value", col("f") === 1)
      .as[(Long, Long, Long, Double)].collect().head
    assert(got == ((4L, 4L, 8L, 0.5)))
  }

  test("chisq drift: hand-computed 2x2 contingency table") {
    // s1: A=30, B=10; s2: A=10, B=30 → E=20 everywhere, χ² = 4·(10²/20) = 20
    val df = (Seq.fill(30)(("A", 0)) ++ Seq.fill(10)(("B", 0)) ++
      Seq.fill(10)(("A", 1)) ++ Seq.fill(30)(("B", 1))).toDF("cat", "f")
    val got = Analytics.chisqDrift(df, "cat", col("f") === 1)
      .as[(Long, Long, Long, Double)].collect().head
    assert(got == ((40L, 40L, 2L, 20.0)))
  }

  test("chisq drift: identical distributions give zero") {
    val df = (Seq.fill(25)(("A", 0)) ++ Seq.fill(15)(("B", 0)) ++
      Seq.fill(25)(("A", 1)) ++ Seq.fill(15)(("B", 1))).toDF("cat", "f")
    val got = Analytics.chisqDrift(df, "cat", col("f") === 1)
      .as[(Long, Long, Long, Double)].collect().head
    assert(got._4 == 0.0)
  }

  test("ks drift: identical samples give zero") {
    val df = ((1 to 100).map(i => (i.toDouble, 0)) ++
      (1 to 100).map(i => (i.toDouble, 1))).toDF("value", "f")
    val got = Analytics.ksDrift(df, "value", col("f") === 1)
      .as[(Long, Long, Long, Double)].collect().head
    assert(got._3 == 0L && got._4 == 0.0)
  }

  test("hll overlap: identical segments → union ≡ each, overlap ≡ estimate") {
    // A and B tag the same 5000 ids: est_a = est_b = est_union exactly
    // (same registers), so overlap_est = est_a
    val df = (1 to 5000).flatMap(i => Seq((i.toLong, "a"), (i.toLong, "b")))
      .toDF("id", "seg")
    val r = Sketches.hllOverlapEstimate(df,
      col("seg") === "a", col("seg") === "b", "id").collect().head
    assert(r.getAs[Long]("est_a") == r.getAs[Long]("est_b"))
    assert(r.getAs[Long]("est_union") == r.getAs[Long]("est_a"))
    assert(r.getAs[Long]("overlap_est") == r.getAs[Long]("est_a"))
  }

  test("hll overlap: disjoint segments → overlap near zero vs segment size") {
    val df = ((1 to 4000).map(i => (i.toLong, "a")) ++
      (100001 to 104000).map(i => (i.toLong, "b"))).toDF("id", "seg")
    val r = Sketches.hllOverlapEstimate(df,
      col("seg") === "a", col("seg") === "b", "id").collect().head
    val overlap = r.getAs[Long]("overlap_est")
    // true overlap 0; sketch error at p=8 is ~6.5% of 4000 ≈ 260 —
    // allow 4σ either side
    assert(math.abs(overlap) < 1100, s"overlap_est=$overlap")
  }

  test("cms join-size estimate: never underestimates, exact when collision-free") {
    // 100 distinct keys × multiplicities 1..4 on side A, 2 on side B:
    // exact = Σ m_k·2; with 100 keys in 2048 buckets collisions are
    // rare but possible — est ≥ exact always
    val a = (1 to 100).flatMap(k => Seq.fill(k % 4 + 1)(k.toLong)).toDF("k")
    val b = (1 to 100).flatMap(k => Seq.fill(2)(k.toLong)).toDF("k")
    val r = Sketches.cmsJoinSizeEstimate(a, "k", b, "k").collect().head
    val exact = (1 to 100).map(k => (k % 4 + 1) * 2L).sum
    assert(r.getAs[Long]("exact_join") == exact)
    assert(r.getAs[Long]("est_join") >= exact)
  }

  test("heavy hitters with external counters: inflated screen never changes output") {
    // 60×a, 30×b, 10×c, relDen=3 → threshold 100/3: a (60) and b (30*3=90 < 100? no)
    // 60*3=180 ≥ 100 → a; 30*3=90 < 100 → b out; c out
    val df = (Seq.fill(60)("ha") ++ Seq.fill(30)("hb") ++ Seq.fill(10)("hc"))
      .zipWithIndex.map { case (s, i) => s.hashCode.toLong + 0L * i -> s }
      .map(_._1).toDF("item")
    val exact = Sketches.heavyHitters(df, "item", relDen = 3L)
      .as[(Long, Long)].collect().toSet
    // saturate every counter: screen passes everything, verify prunes
    val sat = spark.range(Sketches.CmsD.toLong).select(col("id").cast("int").as("j"))
      .crossJoin(spark.range(Sketches.CmsW.toLong).select(col("id").cast("int").as("bucket")))
      .withColumn("cnt", lit(1000000L))
    val got = Sketches.heavyHittersWithCounters(df, sat, "item", relDen = 3L)
      .as[(Long, Long)].collect().toSet
    assert(got == exact && exact.map(_._2) == Set(60L))
  }

  test("scd2 point-in-time lookup: boundary timestamp takes the NEW version") {
    val base = Seq((1L, "OLD", 0L)).toDF("k", "attr", "ver")
    val upd = Seq((1L, "NEW", 100L)).toDF("k", "attr", "ver")
    val hist = Validation.scd2Merge(base, upd, "k", Seq("attr"), "ver")
    val facts = Seq((10L, 1L, 99L), (11L, 1L, 100L), (12L, 1L, 101L))
      .toDF("fact_id", "k", "us")
    val got = facts.join(hist, facts("k") === hist("k") &&
        facts("us") >= hist("valid_from") &&
        (hist("valid_to").isNull || facts("us") < hist("valid_to")))
      .select("fact_id", "attr").as[(Long, String)].collect().toMap
    assert(got == Map(10L -> "OLD", 11L -> "NEW", 12L -> "NEW"))
  }

  test("upsertLatest: newest version wins, untouched keys keep base") {
    val base = Seq((1L, "A", 0L), (2L, "B", 0L), (3L, "C", 0L))
      .toDF("k", "attr", "ver")
    val upd = Seq((1L, "A2", 5L), (3L, "C0", 2L)).toDF("k", "attr", "ver")
    val got = Validation.upsertLatest(base, upd, "k", Seq("attr"), "ver")
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "A2", 5L), (2L, "B", 0L), (3L, "C0", 2L)))
  }

  test("agg state: sharded parquet-roundtrip merge ≡ direct aggregate") {
    val df = Seq(("x", 1L, 1.25), ("x", 1L, 2.50), ("x", 2L, 0.25),
      ("y", 1L, 10.0), ("y", 2L, 0.125))
      .toDF("k", "day", "v")
    val s1 = Validation.aggState(df.filter(col("day") === 1), Seq("k"), "day", "v")
    val s2 = Validation.aggState(df.filter(col("day") === 2), Seq("k"), "day", "v")
    val dir = java.nio.file.Files.createTempDirectory("aggstate").toString
    s1.write.mode("overwrite").parquet(s"$dir/s1")
    s2.write.mode("overwrite").parquet(s"$dir/s2")
    val merged = Validation.mergeAggStates(
        Seq(spark.read.parquet(s"$dir/s1"), spark.read.parquet(s"$dir/s2")),
        Seq("k"))
      .select(col("k"), col("n"), col("val_sum").cast("double"))
      .as[(String, Long, Double)].collect().toSet
    // 0.125 is dropped by DECIMAL(18,4)? no — exactly representable
    assert(merged == Set(("x", 3L, 4.0), ("y", 2L, 10.125)))
  }

  test("kmv set ops: exact below k; merge identity; estimator within bottom-k error; partition-free") {
    val k = 64
    // EXACT regime: |A|=40, |B|=30, |A∩B|=20 — all under k, so jaccard
    // and inter_est are exact by construction
    val a = (1L to 40L).toDF("v")
    val b = (21L to 50L).toDF("v")
    val sa = Sketches.kmvMinsTable(a, Nil, "v", k)
    val sb = Sketches.kmvMinsTable(b, Nil, "v", k)
    val r = Sketches.kmvSetOps(sa, sb, k)
      .as[(Long, Long, Long, Double, Long)].head()
    assert(r._1 == 50L && r._2 == 20L && r._3 == 50L && r._5 == 20L)
    assert(math.abs(r._4 - 0.4) < 1e-12)
    // merge identity: mins(A ∪ B) == merge(mins(A), mins(B))
    val direct = Sketches.kmvMinsTable(a.union(b), Nil, "v", k)
      .as[(Long, Int)].collect().toSet
    val merged = Sketches.kmvMergeMins(Seq(sa, sb), Nil, k)
      .as[(Long, Int)].collect().toSet
    assert(direct == merged)
    // ESTIMATE regime: 5000 ∪ 5000 with 2500 shared, k=64 → relative
    // error ~1/√k ≈ 12.5%; accept 4σ
    val bigA = (1L to 5000L).toDF("v")
    val bigB = (2501L to 7500L).toDF("v")
    val rb = Sketches.kmvSetOps(
        Sketches.kmvMinsTable(bigA, Nil, "v", k),
        Sketches.kmvMinsTable(bigB.repartition(7), Nil, "v", k), k)
      .as[(Long, Long, Long, Double, Long)].head()
    assert(rb._1 == k)
    assert(math.abs(rb._3 - 7500.0) / 7500.0 < 0.5, s"union_est=${rb._3}")
    assert(math.abs(rb._4 - 1.0 / 3.0) < 0.25, s"jaccard=${rb._4}")
    // physical partitioning must not change a single output integer
    val rb2 = Sketches.kmvSetOps(
        Sketches.kmvMinsTable(bigA.repartition(13), Nil, "v", k),
        Sketches.kmvMinsTable(bigB.repartition(3), Nil, "v", k), k)
      .as[(Long, Long, Long, Double, Long)].head()
    assert(rb2 == rb)
  }

  test("sketch tables ignore null values (the native-agg convention)") {
    val withNulls = Seq(Some(1L), None, Some(2L), None, Some(3L)).toDF("v")
    val clean = Seq(1L, 2L, 3L).toDF("v")
    // KMV: a kept null would rank FIRST (Spark sorts nulls first) and
    // displace a real minimum — and DuckDB ranks nulls last, so it
    // would also be engine-divergent
    val kn = Sketches.kmvMinsTable(withNulls, Nil, "v", 8)
      .as[(Long, Int)].collect().toSet
    val kc = Sketches.kmvMinsTable(clean, Nil, "v", 8)
      .as[(Long, Int)].collect().toSet
    assert(kn == kc && kn.size == 3)
    // HLL: a kept null emitted a (null, null) register inflating n_set
    val hn = Sketches.hllRegisters(withNulls, Nil, "v").collect()
    val hc = Sketches.hllRegisters(clean, Nil, "v").collect()
    assert(hn.map(r => (r.get(0), r.get(1))).toSet ==
      hc.map(r => (r.get(0), r.get(1))).toSet)
    assert(hn.forall(r => !r.isNullAt(0) && !r.isNullAt(1)))
  }

  test("ams f2: exact counter replay; shard merge ≡ whole; estimate brackets exact F2") {
    import spark.implicits._
    val gold = BigInt("9e3779b97f4a7c15", 16).toLong
    // multiset: value v appears v times, v = 1..40 → F2 = Σ v²
    val rows = (1L to 40L).flatMap(v => Seq.fill(v.toInt)(v))
    val df = rows.toDF("v")
    val counters = Sketches.amsF2Counters(df, "v", k = 8)
      .orderBy("j").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // exact driver replay of counter 0
    val c0 = (1L to 40L).map { v =>
      val s = if ((graft.functions.Hashing.splitmix64(v + gold) & 1L) == 1L)
        1L else -1L
      s * v
    }.sum
    assert(counters(0) == c0)
    // shard merge: counters over a split union add counter-wise
    val aC = Sketches.amsF2Counters(df.filter(col("v") <= 20), "v", k = 8)
    val bC = Sketches.amsF2Counters(df.filter(col("v") > 20), "v", k = 8)
    val merged = aC.unionByName(bC).groupBy("j")
      .agg(sum("counter").as("counter"))
      .orderBy("j").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(merged == counters)
    // unbiased estimator lands within a loose factor of exact F2
    val f2 = (1L to 40L).map(v => v * v).sum
    val est = Sketches.amsF2Estimate(
        Sketches.amsF2Counters(df, "v", k = 32))
      .collect().head.getLong(1)
    assert(est > f2 / 5 && est < f2 * 5, s"est $est vs exact $f2")
    // nulls are ignored, not signed
    val withNull = df.unionByName(
      Seq[Option[Long]](None).toDF("v"))
    val cn = Sketches.amsF2Counters(withNull, "v", k = 8)
      .orderBy("j").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(cn == counters)
  }

  test("dyadicHistogram: true quantile inside [lo,hi); shard merge = whole; bounded cells") {
    import spark.implicits._
    val rng = new scala.util.Random(241)
    val xs = Seq.fill(5000)(1L + (math.abs(rng.nextLong()) % 1000000L))
    val df = xs.toDF("v")
    val hist = Sketches.dyadicHistogram(df, "v")
    // bounded state: ≤ 64 octaves × 8 cells
    assert(hist.count() <= 64L * 8L)
    val pcts = Seq((1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99"))
    val got = Sketches.dyadicQuantiles(hist, pcts)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val sorted = xs.sorted
    for ((num, den, label) <- pcts) {
      val target = (num.toLong * xs.length + den - 1) / den
      val truth = sorted((target - 1).toInt)
      val (_, n, tr, lo, hi) = got(label)
      assert(n == xs.length && tr == target)
      assert(lo <= truth && truth < hi, s"$label: $truth not in [$lo,$hi)")
      // relative bucket width ≤ 1/8 of its lower edge (oct > 1 here)
      assert(hi - lo <= lo / 8 + 1, s"$label bucket too wide: [$lo,$hi)")
    }
    // mergeable: sharded sketches sum to the whole-corpus sketch
    val (aXs, bXs) = xs.splitAt(2000)
    val merged = Sketches.dyadicHistogram(aXs.toDF("v"), "v")
      .unionByName(Sketches.dyadicHistogram(bXs.toDF("v"), "v"))
      .groupBy("oct", "cell").agg(sum("n").as("n"))
    val whole = hist.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val m2 = merged.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(whole == m2)
  }

  test("profileTable: exact nulls/distincts per column; one scan in the plan") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Some(10)),
      (2L, Some("a"), None),
      (3L, None, Some(10)),
      (4L, Some("b"), Some(20)),
      (4L, Some("b"), Some(20)))
      .toDF("id", "s", "v")
    val got = Validation.profileTable(df)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toList
    assert(got == List(
      ("id", 5L, 0L, 4L),
      ("s", 5L, 1L, 2L),
      ("v", 5L, 1L, 2L)))
    // one-pass claim: the multi-distinct aggregate plans as ONE query
    // over ONE scan (Expand), not #cols separate scans
    val aggs = df.columns.toSeq.flatMap(c => Seq(count(col(c)),
      count_distinct(col(c))))
    val plan = df.agg(count(lit(1)), aggs: _*)
      .queryExecution.optimizedPlan.toString
    val scans = "LocalRelation|Scan".r.findAllIn(plan).length
    assert(plan.contains("Expand") || scans <= 1,
      s"expected a single-scan Expand plan:\n$plan")
  }

  test("cmsPlan: hand-computed width/depth at canonical (eps, delta) points") {
    val got = graft.operators.Sketches.cmsPlan(spark)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // eps = 1% (10000 ppm): width = ceil(2718282/10000) = 272;
    // delta = 1e-6: depth = ceil(ln(1e6)) = ceil(13.8155) = 14
    assert(got((10000L, 1000000L)) == (272L, 14L, 272L * 14L * 8L))
    // eps = 0.01% (100 ppm): width = ceil(2718282/100) = 27183;
    // delta = 1e-2: depth = ceil(ln(100)) = ceil(4.605) = 5
    assert(got((100L, 100L)) == (27183L, 5L, 27183L * 5L * 8L))
    // delta = 1e-9: depth = ceil(ln(1e9)) = ceil(20.723) = 21
    assert(got((1000L, 1000000000L))._2 == 21L)
    // monotonicity across the grid: tighter eps -> wider, smaller
    // delta -> deeper
    assert(got.keySet.size == 16)
  }
}
