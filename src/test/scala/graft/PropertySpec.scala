package graft

import org.apache.spark.sql.functions._

import graft.core.DabDataset
import graft.functions._

/** Property tests (SURVEY §5.4): index-algebra invariants of the
  * positional operators and processor invertibility
  * (`inv_process ∘ process ≈ id`), swept over seeded case grids.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("split length = Σ max(1, ⌊(len−win)/win⌋+1) (abstract.py:968-987)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 6) {
      val lens = List.fill(rnd.nextInt(4) + 1)(rnd.nextInt(59) + 1)
      val win = rnd.nextInt(14) + 2
      val df = lens.map(n => Tuple1((1 to n).map(_.toDouble))).toDF("data")
      val expected = lens.map(n => math.max(1, math.floor((n - win).toDouble / win).toInt + 1)).sum
      assert(DabDataset.fromDataFrame(df).split(Seq("data"), win).len == expected,
        s"lens=$lens win=$win")
    }
  }

  test("concat length and id offsets (SeqAbstract arithmetic, abstract.py:1859-1881)") {
    for ((na, nb) <- Seq((1, 1), (5, 3), (20, 7), (2, 19))) {
      val a = DabDataset.dataset(spark.range(na).toDF("v"), "a")
      val b = DabDataset.dataset(spark.range(nb).toDF("v"), "b")
      val c = a.concat(b)
      assert(c.len == na + nb)
      val ids = c.df.orderBy("_idx").select("_idx", "dataset_id")
        .as[(Long, Int)].collect()
      assert(ids.map(_._1).toSeq == (0L until (na + nb)).toSeq) // dense positions
      assert(ids.count(_._2 == 1) == nb) // appended set re-tagged
    }
  }

  test("selectSlice matches Scala slice-by-step semantics") {
    val n = 50
    val ds = DabDataset.fromDataFrame(spark.range(n).toDF("v").orderBy("v"))
    for ((a, b, step) <- Seq((0, 11, 1), (3, 30, 2), (10, 40, 5), (7, 12, 3))) {
      val got = ds.selectSlice(a, b, step).df.orderBy("_idx")
        .select("v").as[Long].collect().toSeq
      val expected = (a.toLong until b.toLong by step.toLong).toSeq
      assert(got == expected, s"[$a,$b) by $step")
    }
  }

  test("sampleReplicate multiplies length by factor") {
    for ((n, f) <- Seq((1, 1), (7, 3), (15, 4))) {
      val ds = DabDataset.fromDataFrame(spark.range(n).toDF("v"))
      assert(ds.sampleReplicate(lit(f)).len == n.toLong * f)
    }
  }

  test("Scaler invertibility: inv ∘ fwd ≈ id") {
    val rnd = new scala.util.Random(7)
    for (t <- Seq("uint16", "int16", "wav_2_01")) {
      val xs = Seq.fill(20)(rnd.nextDouble() * 2 - 1)
      val p = Scaler(t)
      val df = Seq(Tuple1(xs)).toDF("data")
      val (fwd, _) = p(col("data"), Processor.emptyInfo)
      val (back, _) = p.invert(fwd, Processor.emptyInfo)
      val out = df.select(back).as[Seq[Double]].head()
      xs.zip(out).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9, t) }
    }
  }

  test("Normalizer invertibility after fit (minmax + standard)") {
    val rnd = new scala.util.Random(13)
    for (t <- Seq("minmax", "standard"); _ <- 1 to 3) {
      val xs = Seq.fill(10)(rnd.nextDouble() * 100 - 50)
      val df = xs.map(v => Tuple1(Seq(v))).toDF("data")
      val p = Normalizer(t).fit(df, "data")
      val (fwd, _) = p(col("data"), Processor.emptyInfo)
      val (back, _) = p.invert(fwd, Processor.emptyInfo)
      val out = df.select(back).as[Seq[Double]].collect().flatten
      xs.zip(out).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6, t) }
    }
  }

  test("fft/ifft roundtrip for arbitrary signals (incl. non-pow2)") {
    val rnd = new scala.util.Random(99)
    for (n <- Seq(2, 3, 7, 12, 16, 25, 33, 40)) {
      val x = Array.fill(n)(rnd.nextDouble() * 2 - 1)
      val (fr, fi) = Dsp.fft(x, new Array[Double](n))
      val (br, _) = Dsp.ifft(fr, fi)
      x.zip(br).foreach { case (a, b) => assert(math.abs(a - b) < 1e-8, s"n=$n") }
    }
  }

  test("minhash est-jaccard ≈ exact jaccard on shingle sets") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away home"
    val words = base.split(" ")
    for (mutations <- 0 to 4) {
      val rnd = new scala.util.Random(mutations * 7 + 1)
      val mutated = words.zipWithIndex.map { case (w, i) =>
        if (i < mutations * 3) rnd.nextInt(1000).toString else w
      }.mkString(" ")
      def shingleSet(t: String) = t.toLowerCase.sliding(5).toSet
      val exact = {
        val a = shingleSet(base); val b = shingleSet(mutated)
        a.intersect(b).size.toDouble / a.union(b).size
      }
      val sa = Hashing.minhashSignature(base, 5, 128)
      val sb = Hashing.minhashSignature(mutated, 5, 128)
      val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / 128
      assert(math.abs(est - exact) < 0.2, s"est=$est exact=$exact mut=$mutations")
    }
  }

  test("resample length = round(target/src * n) across ratios") {
    val x = Array.tabulate(100)(i => math.sin(0.2 * i))
    for ((tgt, src) <- Seq((50, 100), (200, 100), (75, 100), (100, 100))) {
      val out = Dsp.resample(x, math.round(tgt.toDouble / src * x.length).toInt)
      assert(out.length == math.round(tgt.toDouble / src * 100).toInt)
    }
  }

  test("withRunningTotal equals the naive driver cumsum across seeds/NULL mixes") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 4) {
      val n = 40 + rnd.nextInt(60)
      val rows = (0 until n).map { i =>
        val v: java.lang.Long =
          if (rnd.nextInt(5) == 0) null else java.lang.Long.valueOf(rnd.nextInt(100).toLong)
        (i.toLong, v)
      }
      val df = rows.toDF("k", "v").repartition(1 + rnd.nextInt(8))
      val got = graft.operators.Packing
        .withRunningTotal(df, Seq("k"), "v", numBuckets = 1 + rnd.nextInt(6))
        .select("k", "running").as[(Long, Long)].collect().toMap
      var acc = 0L
      rows.sortBy(_._1).foreach { case (k, v) =>
        acc += (if (v == null) 0L else v.longValue())
        assert(got(k) == acc, s"trial=$trial k=$k")
      }
    }
  }

  test("lshTopK recall@k vs brute force holds across seeded corpora (10× of the fixture)") {
    // property bound, not a fixed fixture: on any clustered corpus the
    // multi-table hyperplane LSH must recover most of the true top-k —
    // mean recall ≥ 0.7 per corpus, and never a total miss per query.
    // 400 vectors = 10× the fixed OperatorsSpec fixture.
    import graft.operators.Similarity
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val nClusters = 4 + rnd.nextInt(3)
      val base = (0 until 400).map { i =>
        val c = i % nClusters
        val v = Array.tabulate(16) { j =>
          val centroid = if (j % nClusters == c) 1.0f else 0.0f
          centroid + (rnd.nextFloat() - 0.5f) * 0.2f
        }
        (i.toLong, v.toSeq)
      }
      val df = base.toDF("vec_id", "embedding")
      val queries = df.filter($"vec_id" < 8)
      val brute = Similarity.bruteForceTopK(df, queries, k = 5)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val lsh = Similarity.lshTopK(df, queries, k = 5, nPlanes = 8, tables = 8)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val perQuery = brute.map { case (q, truth) =>
        (lsh.getOrElse(q, Set.empty) intersect truth).size.toDouble / truth.size
      }.toSeq
      val mean = perQuery.sum / perQuery.size
      assert(mean >= 0.7, s"trial $trial: mean recall@5 $mean < 0.7")
      assert(perQuery.forall(_ > 0.0), s"trial $trial: a query missed entirely")
    }
  }

  test("foldMasksVal partitions every fold across seeds and val fractions") {
    val df = (0L until 120L).map(i => (i, (i % 7).toDouble.min(1.0) * 0)).toDF("id", "test_only")
    for (seed <- Seq(0L, 1L, 99L); vf <- Seq(0.1, 1.0 / 3, 0.7)) {
      val m = graft.operators.Xval.foldMasksVal(
        graft.operators.Xval.md5Kfold(df, 3, "id"), 3, vf, "id", seed = seed)
      for (k <- 0 until 3) {
        val sets = m.select(
          col(s"xval_train_fold_$k").cast("int") +
            col(s"xval_val_fold_$k").cast("int") * 2 +
            col(s"xval_test_fold_$k").cast("int") * 4)
          .as[Int].collect()
        // exactly one of train(1) / val(2) / test(4) per row
        assert(sets.forall(s => s == 1 || s == 2 || s == 4), s"seed=$seed vf=$vf k=$k")
      }
    }
  }

  test("semanticDedup: planted exact duplicates always pruned (seeded corpora)") {
    import graft.operators.Similarity
    for (seed <- Seq(1, 17, 99)) {
      val rnd = new scala.util.Random(seed)
      val basis = Array.fill(40)(
        Array.fill(16)((rnd.nextInt(255) - 127).toFloat))
      // 40 random vectors + 20 exact copies at higher ids: identical
      // vectors quantize identically → same cell, cosine 1 → every
      // planted copy must be pruned whatever the clustering did
      val rows = (0 until 40).map(i => (i.toLong, basis(i))) ++
        (40 until 60).map(i => (i.toLong, basis(i - 40)))
      val out = Similarity.semanticDedup(
        rows.toDF("vec_id", "embedding"), nCells = 8, iters = 2)
        .as[(Long, Int, Long, Long, Boolean)].collect()
      assert(out.length == 60, s"seed=$seed: every vector reported")
      val pruned = out.filter(!_._5)
      assert((40L until 60L).forall(id => pruned.exists(_._1 == id)),
        s"seed=$seed: a planted copy survived")
      // pruned rows always point at a strictly earlier representative
      assert(pruned.forall(r => r._4 >= 0 && r._4 < r._1), s"seed=$seed")
    }
  }
}
