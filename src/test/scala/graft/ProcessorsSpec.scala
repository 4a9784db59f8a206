package graft

import org.apache.spark.sql.functions._
import graft.functions._

/** Processor/Chain layer: invertibility properties
  * (inv_process ∘ process ≈ id, SURVEY §5), Framing shape goldens, the
  * reference's chain-info propagation, fitted Normalizer two-phase agg.
  */
class ProcessorsSpec extends SparkSpec {
  import spark.implicits._

  private def sig(n: Int): Seq[Double] = (0 until n).map(i => math.sin(0.1 * i) * 100)

  test("Scaler int16 roundtrip (processors.py:168-195)") {
    val df = Seq(Tuple1(sig(10))).toDF("data")
    val p = Scaler("int16")
    val (fwd, _) = p(col("data"), Processor.emptyInfo)
    val (back, _) = p.invert(fwd, Processor.emptyInfo)
    val out = df.select(back.as("b")).as[Seq[Double]].head()
    sig(10).zip(out).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("Logarithm base10 roundtrip on positive data") {
    val df = Seq(Tuple1(Seq(1.0, 10.0, 100.0))).toDF("data")
    val p = Logarithm("base10")
    val (fwd, _) = p(col("data"), Processor.emptyInfo)
    val out = df.select(fwd.as("f")).as[Seq[Double]].head()
    assert(out == Seq(0.0, 20.0, 40.0)) // 20*log10
  }

  test("Framing: 1s @ fs=100, win=0.25/step=0.25, none → 4 frames of 25") {
    val df = Seq(Tuple1(sig(100))).toDF("data")
    val p = Framing(0.25, 0.25, "none")
    val (framed, info) = p(col("data"), Processor.initInfo(100))
    val out = df.select(framed.as("f"), info.getField("time_step").as("ts"))
      .as[(Seq[Seq[Double]], Double)].head()
    assert(out._1.length == 4)
    assert(out._1.forall(_.length == 25))
    assert(out._1.head == sig(100).take(25))
    assert(out._2 == 0.25)
  }

  test("Framing hamming window scales frame ends down") {
    val df = Seq(Tuple1(Seq.fill(100)(1.0))).toDF("data")
    val (framed, _) = Framing(0.1, 0.1, "hamming")(col("data"), Processor.initInfo(100))
    val f0 = df.select(framed).as[Seq[Seq[Double]]].head().head
    assert(math.abs(f0.head - 0.08) < 1e-12) // hamming[0]
    assert(f0.max <= 1.0)
  }

  test("FFT processor magnitude golden: pure tone (depth=1)") {
    val n = 32
    val tone = (0 until n).map(i => math.sin(2 * math.Pi * 4 * i / n))
    val df = Seq(Tuple1(tone)).toDF("data")
    val (out, info) = FFTProcessor("magnitude", "nextpow2", depth = 1)(
      col("data"), Processor.initInfo(n))
    val (mags, nfft) = df.select(out.as("m"), info.getField("nfft").as("n"))
      .as[(Seq[Double], Int)].head()
    assert(mags.length == n / 2 + 1)
    assert(nfft == n)
    assert(mags.indexOf(mags.max) == 4)
  }

  test("chain folds processors and threads info (processing_chain.py:97-108)") {
    val chain = Chain(Seq(
      Framing(0.25, 0.25, "none"),
      FFTProcessor("power", "nextpow2"),
      AggregationProcessor(Seq("mean", "std"))))
    val df = Seq(Tuple1(sig(64))).toDF("data")
    val (feat, info) = chain(col("data"), Processor.initInfo(64))
    val (out, ts) = df.select(feat.as("f"), info.getField("time_step").as("t"))
      .as[(Seq[Double], Double)].head()
    // fs=64, win 0.25 → flen 16, 4 frames; nextpow2(16)=16 → 9 bins; ×2 stats
    assert(out.length == 18)
    assert(ts == 0.0) // Aggregation sets time_step=0 (processors.py:517)
  }

  test("Normalizer minmax fit+apply+invert (processors.py:93-165)") {
    val df = Seq(Tuple1(Seq(0.0, 5.0, 10.0)), Tuple1(Seq(2.0, 4.0, 20.0)))
      .toDF("data")
    val p = Normalizer("minmax").fit(df, "data")
    val (fwd, _) = p(col("data"), Processor.emptyInfo)
    val rows = df.select(fwd.as("f")).as[Seq[Double]].collect()
    val all = rows.flatten
    assert(math.abs(all.min - 0.0) < 1e-12 && math.abs(all.max - 1.0) < 1e-12)
    val (back, _) = p.invert(fwd, Processor.emptyInfo)
    val orig = df.select(back.as("b")).as[Seq[Double]].collect().flatten
    assert(math.abs(orig.min - 0.0) < 1e-9 && math.abs(orig.max - 20.0) < 1e-9)
  }

  test("Normalizer standard: fitted mean≈0 std≈1") {
    val df = (1 to 50).map(i => Tuple1(Seq(i.toDouble))).toDF("data")
    val p = Normalizer("standard").fit(df, "data")
    val (fwd, _) = p(col("data"), Processor.emptyInfo)
    val vals = df.select(fwd).as[Seq[Double]].collect().flatten
    assert(math.abs(Dsp.mean(vals.toArray)) < 1e-9)
    assert(math.abs(Dsp.std(vals.toArray) - 1.0) < 1e-9)
  }

  test("chain fit only fits trainable stages (causal recursion)") {
    val chain = Chain(Seq(Scaler("wav_2_01"), Normalizer("minmax")))
    val df = Seq(Tuple1(Seq(-1.0, 0.0, 1.0))).toDF("data")
    val fitted = chain.fit(df, "data")
    // Scaler maps [-1,1]→[0,1]; Normalizer fitted on scaled data → minmax over [0,1] = identity-ish
    val (fwd, _) = fitted(col("data"), Processor.emptyInfo)
    val out = df.select(fwd).as[Seq[Double]].head()
    assert(math.abs(out.head - 0.0) < 1e-12 && math.abs(out.last - 1.0) < 1e-12)
  }

  test("FIRFilter + Resample processors run over DataFrame") {
    val df = Seq(Tuple1(sig(200))).toDF("data")
    val fir = FIRFilter("lowpass", f = 10, taps = 31, fs = 100)
    val (filtered, _) = fir(col("data"), Processor.initInfo(100))
    assert(df.select(filtered).as[Seq[Double]].head().length == 200)
    val rs = Resample(targetFs = 50, srcFs = 100)
    val (resampled, info) = rs(col("data"), Processor.initInfo(100))
    val (out, fs) = df.select(resampled.as("r"), info.getField("fs").as("fs"))
      .as[(Seq[Double], Int)].head()
    assert(out.length == 100)
    assert(fs == 50)
  }

  test("ExpandDims wraps innermost elements (processors.py:603-611)") {
    val df = Seq(Tuple1(Seq(1.0, 2.0))).toDF("data")
    val (out, _) = ExpandDims()(col("data"), Processor.emptyInfo)
    assert(df.select(out).as[Seq[Seq[Double]]].head() == Seq(Seq(1.0), Seq(2.0)))
  }

  test("FFT split format emits re‖im; dc_reset zeroes bin 0") {
    val n = 16
    val x = (0 until n).map(i => math.cos(2 * math.Pi * 2 * i / n) + 1.0)
    val df = Seq(Tuple1(x)).toDF("data")
    val (split, _) = FFTProcessor("split", "nextpow2", depth = 1)(
      col("data"), Processor.initInfo(n))
    val out = df.select(split).as[Seq[Double]].head()
    assert(out.length == 2 * (n / 2 + 1)) // re ++ im
    val (dc, _) = FFTProcessor("magnitude", "nextpow2", dcReset = true, depth = 1)(
      col("data"), Processor.initInfo(n))
    val mags = df.select(dc).as[Seq[Double]].head()
    assert(mags.head == 0.0) // DC zeroed despite +1 offset
    assert(mags(2) > 1.0)    // tone bin intact
  }

  test("chain threads output_shape after each step (processing_chain.py:106-107)") {
    val chain = Chain(Seq(
      Framing(0.25, 0.25, "none"),
      FFTProcessor("magnitude", "nextpow2"),
      AggregationProcessor(Seq("mean", "std"))))
    val df = Seq(Tuple1(sig(64))).toDF("data")
    val (_, info) = chain(col("data"), Processor.initInfo(64))
    val shape = df.select(info.getField("output_shape")).as[Seq[Int]].head()
    assert(shape == Seq(18)) // final: 9 bins × 2 stats, 1-D
  }

  test("chain json round-trip incl. fitted state (processing_chain.py:174-189)") {
    val df = Seq(Tuple1(Seq(0.0, 5.0, 10.0))).toDF("data")
    val chain = Chain(Seq(Scaler("int16"), Normalizer("minmax"))).fit(df, "data")
    val json = chain.toJson
    val rebuilt = Chain.fromJson(json)
    assert(rebuilt.steps.map(_.name) == Seq("Scaler", "Normalizer"))
    // fitted stats survive: same transform without re-fitting
    val (a, _) = chain(col("data"), Processor.emptyInfo)
    val (b, _) = rebuilt(col("data"), Processor.emptyInfo)
    val ra = df.select(a).as[Seq[Double]].head()
    val rb = df.select(b).as[Seq[Double]].head()
    ra.zip(rb).foreach { case (x, y) => assert(math.abs(x - y) < 1e-12) }
  }

  test("registry builds processors from string configs (processing_chain.py:69-80)") {
    val p = Chain.registry("Scaler")(Map("type" -> "int16"))
    assert(p.name == "Scaler")
    val f = Chain.registry("Framing")(Map("windowsize" -> "0.1", "stepsize" -> "0.1"))
    assert(f.name == "Framing")
  }

  test("registry covers the full processor library incl. band/resample params") {
    assert(Chain.registry("Windowing")(Map.empty).name == "Windowing")
    val bp = Chain.registry("FIRFilter")(
      Map("type" -> "bandpass", "f" -> "500", "f2" -> "1500", "fs" -> "8000"))
    assert(bp.name == "FIRFilter")
    assert(Chain.registry("Resample")(
      Map("target_fs" -> "8000", "src_fs" -> "16000")).name == "Resample")
    val fft = Chain.registry("FFT")(Map("format" -> "power", "dc_reset" -> "true"))
    assert(fft.params("format") == "power")
    assert(Chain.registry("Filterbank")(
      Map("n_bands" -> "20", "fs" -> "8000", "nfft" -> "256")).name == "Filterbank")
    assert(Chain.registry("ExpandDims")(Map("depth" -> "2")).name == "ExpandDims")
  }

  test("every registry processor round-trips through params with nothing reset to defaults") {
    // Non-default values everywhere, so a dropped param can't hide behind a
    // matching default (the ADVICE round-3 regression: Chain.toJson →
    // fromJson silently rebuilding e.g. Resample(48000) with srcFs=16000).
    val samples: Seq[Processor] = Seq(
      Scaler("int16", depth = 2),
      Logarithm("natural", depth = 2),
      ExpandDims(depth = 3),
      DummyProcessor(),
      Framing(0.2, 0.05, "hann"),
      WindowingProcessor("hann", depth = 2),
      FFTProcessor("split", "original", dcReset = true, depth = 1),
      Filterbank(40, "linear", fs = 48000, nfft = 1024, fmin = 50.0,
        fmax = 8000.0, norm = Some("slaney"), depth = 1),
      Normalizer("minmax", featureRange = (-1.0, 1.0),
        stats = Some((2.5, 7.5)), depth = 2),
      AggregationProcessor(Seq("mean", "kurtosis")),
      FIRFilter("bandpass", 500.0, taps = 51, fs = 8000.0, window = "hann", f2 = 1500.0),
      Resample(16000, srcFs = 48000))
    for (p <- samples) {
      val rebuilt = Chain.makeProcessor(p.name, p.params)
      assert(rebuilt == p, s"${p.name}: $rebuilt != $p")
    }
    // f2=NaN defeats case-class == (NaN != NaN); identity via params instead
    val lp = FIRFilter("lowpass", 1000.0, taps = 31, fs = 44100.0, window = "hamming")
    val lpR = Chain.makeProcessor(lp.name, lp.params)
    assert(lpR.params == lp.params && lpR.name == lp.name)
  }

  test("Framing: signal shorter than one frame yields zero frames, not garbage") {
    // 10 samples, frame = 0.25s @ fs=100 = 25 samples → 0 frames; the
    // reference asserts here (processors.py:242), the engine returns empty
    val df = Seq(Tuple1(sig(10))).toDF("data")
    val (framed, _) = Framing(0.25, 0.25, "none")(col("data"), Processor.initInfo(100))
    val out = df.select(framed.as("f")).as[Seq[Seq[Double]]].head()
    assert(out.isEmpty)
  }

  test("FFT nfft metadata matches the kernel's integer nextPow2 (incl. exact powers of two)") {
    for (n <- Seq(1, 2, 31, 32, 33, 512)) {
      val df = Seq(Tuple1(sig(n))).toDF("data")
      val (_, info) = FFTProcessor("magnitude", "nextpow2", depth = 1)(
        col("data"), Processor.initInfo(n))
      val got = df.select(info.getField("nfft")).as[Int].head()
      assert(got == Dsp.nextPow2(n), s"n=$n got=$got want=${Dsp.nextPow2(n)}")
    }
  }
}
