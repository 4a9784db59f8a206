package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.DabDataset

/** File-backed source table: the Spark-native `FolderDictSeqAbstract`
  * (reference dabstract/dataset/helpers.py:187-290).
  *
  * The reference walks a directory tree (sorted), yielding columns
  * `filepath, example, filename, subdb, info` plus a lazily-decoded
  * `data` column. Here the walk is Spark's distributed `binaryFile`
  * listing (InMemoryFileIndex — parallel, cached), path columns are
  * `regexp_extract` expressions, decode is [[WavCodec]] in a UDF, and the
  * reference's `file_info.pickle` metadata cache (helpers.py:377-393)
  * becomes a parquet sidecar written next to the dataset.
  */
object FolderSource {

  private def decodeUdf(targetFs: Option[Int], resample: Boolean) =
    udf((bytes: Array[Byte]) => {
      val w = WavCodec.decode(bytes, targetFs = targetFs, resample = resample)
      (w.samples.toSeq, w.fs, w.channels)
    })

  /** Scan `path` for `*.ext` files: one row per file, sorted by path for
    * the reference's deterministic ordering (helpers.py:363-367), with
    * positional `_idx`.
    */
  def scan(spark: SparkSession, path: String, ext: String = "wav"): DabDataset = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", s"*.$ext")
      .option("recursiveFileLookup", "true")
      .load(path)
      .orderBy("path")
      .select(
        regexp_replace(col("path"), "^file:", "").as("filepath"),
        col("content"))
      .withColumn("_parts", split(col("filepath"), "/"))
      .withColumn("filename", element_at(col("_parts"), -1))
      .withColumn("subdb", element_at(col("_parts"), -2))
      .withColumn("example", concat_ws("/", col("subdb"), col("filename")))
      .drop("_parts")
    DabDataset.fromDataFrame(files)
  }

  /** Scan WITHOUT materializing file bodies: the `binaryFile` source only
    * reads a file's content when the `content` column is selected, so this
    * listing job touches directory metadata + file sizes only. Pair with
    * [[withRangeDecodedAudio]] for sub-file byte-range reads.
    */
  def scanPaths(spark: SparkSession, path: String, ext: String = "wav"): DabDataset = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", s"*.$ext")
      .option("recursiveFileLookup", "true")
      .load(path)
      .orderBy("path")
      .select(
        regexp_replace(col("path"), "^file:", "").as("filepath"),
        col("length").as("file_bytes"))
      .withColumn("_parts", split(col("filepath"), "/"))
      .withColumn("filename", element_at(col("_parts"), -1))
      .withColumn("subdb", element_at(col("_parts"), -2))
      .withColumn("example", concat_ws("/", col("subdb"), col("filename")))
      .drop("_parts")
    DabDataset.fromDataFrame(files)
  }

  /** Decode only frames `[startFrame, stopFrame)` of each file via
    * [[WavCodec.decodeRange]]: executors open the file and read header +
    * range — bytes read proportional to the chunk, not the clip
    * (reference range pushdown, abstract.py:1019-1029 →
    * processors.py:42-47). Use over [[scanPaths]] output so the listing
    * never materializes full bodies either.
    */
  def withRangeDecodedAudio(ds: DabDataset, startFrame: Int, stopFrame: Int,
      pathCol: String = "filepath", dataCol: String = "data"): DabDataset = {
    val u = udf((path: String) => {
      val w = WavCodec.decodeRange(path, startFrame, stopFrame)
      (w.samples.toSeq, w.fs, w.channels)
    })
    val dec = u(col(pathCol))
    ds.add("_dec", dec)
      .add(dataCol, col("_dec._1"))
      .add("info", struct(
        col("_dec._2").as("fs"),
        (lit(1.0) / col("_dec._2")).as("time_step"),
        array(size(col("_dec._1")), col("_dec._3")).as("output_shape"),
        lit(null).cast("int").as("nfft")))
      .remove("_dec")
  }

  /** Add decoded audio + info struct (reference's map_fct on `data`,
    * helpers.py:263-264): `data: array<double>`,
    * `info: struct<fs,time_step,output_shape,nfft>`.
    *
    * `targetFs` + `resample` reproduce the reference's resample-on-read
    * (`WavDatareader(fs=..., resample=True)`, processors.py:33-37,59-65):
    * with a targetFs and resample=false, files at another rate fail the
    * task (the reference's assert); with resample=true they are
    * FFT-resampled inside the decode UDF, so downstream info.fs/time_step
    * reflect the requested rate.
    */
  def withDecodedAudio(ds: DabDataset, bytesCol: String = "content",
      dataCol: String = "data", targetFs: Option[Int] = None,
      resample: Boolean = false): DabDataset = {
    val dec = decodeUdf(targetFs, resample)(col(bytesCol))
    ds.add("_dec", dec)
      .add(dataCol, col("_dec._1"))
      .add("info", struct(
        col("_dec._2").as("fs"),
        (lit(1.0) / col("_dec._2")).as("time_step"),
        array(size(col("_dec._1")), col("_dec._3")).as("output_shape"),
        lit(null).cast("int").as("nfft")))
      .remove("_dec")
  }

  /** Align a metadata table to the scanned files by filename (reference
    * DB classes hand-build this equi-join with `filenames.index(...)`,
    * dbs/DCASE2020Task1B.py:63-70) — a broadcast join here; row order
    * and `_idx` are untouched (left join keeps every scanned file).
    */
  def joinMeta(ds: DabDataset, meta: DataFrame,
      on: String = "filename"): DabDataset = {
    val d = ds.df.join(
      org.apache.spark.sql.functions.broadcast(meta), Seq(on), "left")
    DabDataset.fromExisting(d)
  }

  /** Probe + cache per-file metadata (reference `get_dir_info`'s
    * `file_info.pickle`, helpers.py:341-393): writes a parquet sidecar
    * once, reuses it on the next build (`mode("ignore")` = the
    * reference's overwrite_file_info=False).
    */
  def fileInfoSidecar(ds: DabDataset, sidecarPath: String,
      overwrite: Boolean = false): DataFrame = {
    val spark = ds.spark
    val exists = try {
      spark.read.parquet(sidecarPath).schema.nonEmpty && !overwrite
    } catch { case _: Throwable => false }
    if (!exists) {
      withDecodedAudio(ds).df
        .select(col("filepath"), col("info.fs").as("fs"),
          col("info.time_step").as("time_step"),
          col("info.output_shape").as("output_shape"))
        .write.mode(if (overwrite) "overwrite" else "ignore").parquet(sidecarPath)
    }
    spark.read.parquet(sidecarPath)
  }
}
