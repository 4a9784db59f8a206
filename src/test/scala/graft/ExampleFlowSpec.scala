package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.core.DabDataset
import graft.functions._
import graft.operators.{Features, Xval}
import graft.sources.{FolderSource, WavCodec}

/** The reference's end-to-end EXAMPLE flow (FIXTURES.md F3; reference
  * tests/test_dataset.py + examples/EXAMPLE): folder of wav files per
  * subdb → decoded table with labels → processor chain → split into
  * fixed-duration chunks (metadata replicating) → xval folds → train-set
  * selection → feature materialization. A user of the reference can run
  * this exact pipeline on the engine.
  */
class ExampleFlowSpec extends SparkSpec {
  import spark.implicits._

  private val fsHz = 8000
  private val clipSec = 10
  private val filesPerDb = 4

  private lazy val root: String = {
    val dir = Files.createTempDirectory("graft_example")
    val rnd = new scala.util.Random(42)
    for (subdb <- Seq("normal", "abnormal"); k <- 0 until filesPerDb) {
      val d = dir.resolve(subdb)
      Files.createDirectories(d)
      val samples = Array.fill(fsHz * clipSec)(rnd.nextDouble() * 0.5 - 0.25)
      Files.write(d.resolve(f"$k%03d.wav"), WavCodec.encodePcm16(samples, fsHz))
    }
    dir.toString
  }

  test("full EXAMPLE pipeline: scan → decode → label → split → xval → features") {
    // 1. scan + decode (FolderDictSeqAbstract + WavDatareader)
    val base = FolderSource.withDecodedAudio(FolderSource.scan(spark, root))
    assert(base.len == 2L * filesPerDb) // test_dataset.py:85 analog

    // 2. label column from subdb (DCASE2020Task1B.py:41-79 analog)
    val labeled = base.add("binary_anomaly",
      when(col("subdb") === "abnormal", 1.0).otherwise(0.0))

    // 3. chain on the data column (MapAbstract)
    val mapped = labeled.addMap("data", Chain(Seq(Scaler("wav_2_01"))), Some("scaled"))

    // 4. split into 2-second chunks — metadata columns replicate
    //    (add_split semantics, len == nFiles * clipSec/2)
    val split = mapped.splitSeconds(Seq("data", "scaled"), 2.0)
    assert(split.len == 2L * filesPerDb * (clipSec / 2))
    val chunk = split.df.orderBy("_idx")
      .select(size(col("data")), col("subdb")).as[(Int, String)].head()
    assert(chunk._1 == fsHz * 2)
    assert(chunk._2 == "abnormal") // sorted path order preserved through split
    // first chunk equals raw head slice (test_dataset.py:282-286)
    val raw = base.df.orderBy("_idx").select("data").as[Seq[Double]].head()
    val firstChunk = split.df.orderBy("_idx").select("data").as[Seq[Double]].head()
    assert(firstChunk == raw.take(fsHz * 2))

    // 5. group-aware xval on the original file (example column) so chunks
    //    of one clip never straddle folds
    val folded = Xval.foldMasks(
      Xval.hashKfold(split.df, 4, "example", seed = 1), 4)
    val train0 = Xval.xvalSet(folded, "train", 0)
    val test0 = Xval.xvalSet(folded, "test", 0)
    assert(train0.count() + test0.count() == split.len)
    // every clip's chunks land in exactly one fold
    val perClip = folded.groupBy("example")
      .agg(countDistinct("fold").as("nf")).select("nf").as[Long].collect()
    assert(perClip.forall(_ == 1))

    // 6. feature extraction on the split table (prepare_feat analog):
    //    Framing → FFT → Aggregation, written + read back
    val featPath = Files.createTempDirectory("graft_example_feat").toString + "/fe"
    val chain = Chain(Seq(
      Framing(0.025, 0.025, "hamming"),
      FFTProcessor("power", "nextpow2"),
      AggregationProcessor(Seq("mean", "std"))))
    val withFeat = Features.prepareFeat(
      DabDataset.fromExisting(folded), "data", Some("info"), chain, "feat", featPath)
    assert(withFeat.len == split.len)
    val featDim = withFeat.df.select(size(col("feat"))).as[Int].head()
    // flen = 0.025*8000 = 200 → nfft 256 → 129 bins × 2 stats
    assert(featDim == 258)
  }

  test("config-driven EXAMPLE: yaml dirs + resample-on-read + dp-chain from config") {
    // dirs-style config (anchors + !pathjoin, like configs/dirs/local.yaml)
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    val dirs = graft.sources.Yaml.parse(
      s"""base: &base $root
         |paths:
         |  data: !pathjoin [*base]
         |""".stripMargin)
    val dataPath = (dirs \ "paths" \ "data").extract[String]

    // scan with read-time resample to 4 kHz (WavDatareader fs=4000 resample=True)
    val base = FolderSource.withDecodedAudio(
      FolderSource.scan(spark, dataPath), targetFs = Some(4000), resample = true)
    assert(base.df.select(col("info.fs")).as[Int].head() == 4000)

    // dp chain from the reference's config shape (configs/dp/*.yaml)
    val chain = graft.sources.ConfigSource.chainFromYaml(
      """chain:
        |  - name: Framing
        |    parameters:
        |      windowsize: 0.025
        |      stepsize: 0.025
        |  - name: FFT
        |    parameters:
        |      format: power
        |  - name: Aggregation
        |    parameters:
        |      methods: [mean,std]
        |""".stripMargin)
    val feat = base.addMap("data", chain, Some("feat"))
    val dim = feat.df.select(size(col("feat"))).as[Int].head()
    // flen = 0.025·4000 = 100 → nfft 128 → 65 rfft bins × 2 stats
    assert(dim == 130)
  }
}
