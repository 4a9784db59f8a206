package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Extra args beyond (sfDir, outDir) name a query subset — used by the
  * ScaleUp gate to re-check float/decimal-sensitive queries at 10×
  * without paying for the full suite.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val subset: Set[String] = args.drop(2).toSet
    (subset -- SparkEntry.queries.keySet).foreach(n =>
      System.err.println(s"[verify] unknown query name: $n (skipped)"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // invariance-audit knobs (COVERAGE.md): the same board must produce
    // identical values under different shuffle fan-outs and with AQE on
    // or off — cluster-like configs, exercised by the r13 audit
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_AQE").foreach(v =>
      builder.config("spark.sql.adaptive.enabled", v))
    // the 2000-partition audit config needs headroom for memory-sink
    // collects (720 tasks' serialized results > the 1g default on q82)
    sys.env.get("SPARK_GRAFT_MAX_RESULT_SIZE").foreach(v =>
      builder.config("spark.driver.maxResultSize", v))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val failed = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    SparkEntry.queries
      .filter { case (name, _) => subset.isEmpty || subset(name) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          failed += name -> String.valueOf(e.getMessage)
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // A query that THROWS leaves no output dir, and a per-name compare
    // would silently omit it — recording an all-green round over a
    // shrunken query set (exactly the round-8 TIMESTAMP_NTZ incident).
    // Persist the failure list next to the outputs so any consumer can
    // (and tools/check_oracle.py does) fail the gate on omissions, and
    // exit non-zero so scripted runs can't miss it.
    val errJson = "{\"full\": " + (subset.isEmpty: Boolean) +
      ", \"failed\": " + failed
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}") +
      "}"
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"), errJson)
    println(s"VERIFY_FAILED=${failed.size}" +
      (if (failed.isEmpty) "" else failed.map(_._1).mkString(" [", ",", "]")))
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
