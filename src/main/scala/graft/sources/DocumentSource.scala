package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest an LLM document corpus into the engine's canonical
  * `(doc_id: long, text: string, …meta)` shape from the formats corpora
  * actually ship in — JSONL (one JSON object per line, the Common
  * Crawl / HF-datasets convention), CSV, or parquet.
  *
  * Columns: the text field is required (`textField`, default "text";
  * renamed to `text`). If the input carries no usable id column, a
  * stable one is synthesized: `doc_id = xxhash64(file, offset-in-file)`
  * via `input_file_name` + a per-file row ordinal — deterministic for a
  * fixed input layout and computed map-side (no global ordering pass,
  * which at 100 TB would be a full-shuffle non-starter). For a dense
  * 0..n−1 id (the reference's `_idx` semantics), wrap the result in
  * `DabDataset.fromDataFrame` instead — that is the two-narrow-pass
  * zipWithIndex path and costs a materialization.
  */
object DocumentSource {

  /** Read `path` as jsonl/csv/parquet (by extension, or `format`
    * override), normalize to (doc_id, text, …rest).
    */
  def read(spark: SparkSession, path: String, textField: String = "text",
      idField: Option[String] = None, format: Option[String] = None): DataFrame = {
    val fmt = format.getOrElse {
      val p = path.toLowerCase
      if (p.endsWith(".jsonl") || p.endsWith(".json") || p.endsWith(".jsonl.gz")) "json"
      else if (p.endsWith(".csv") || p.endsWith(".csv.gz")) "csv"
      else "parquet"
    }
    val raw = fmt match {
      case "json" => spark.read.json(path)
      case "csv" => spark.read.option("header", "true").csv(path)
      case _ => spark.read.parquet(path)
    }
    require(raw.columns.contains(textField),
      s"document source $path has no '$textField' column (columns: ${raw.columns.mkString(", ")})")
    val withText =
      if (textField == "text") raw
      else raw.withColumnRenamed(textField, "text")
    idField match {
      case Some(f) =>
        require(withText.columns.contains(f), s"no id column '$f' in $path")
        withText.withColumn("doc_id", col(f).cast("long"))
      case None =>
        // map-side stable id: hash of (file, row ordinal within file).
        // monotonically_increasing_id is partition-prefixed (layout-
        // dependent); the per-file ordinal + file name is stable for a
        // fixed input layout and needs no shuffle.
        withText
          .withColumn("_file", input_file_name())
          .withColumn("_ord",
            row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy("_file")
              .orderBy(monotonically_increasing_id())))
          .withColumn("doc_id", xxhash64(col("_file"), col("_ord")))
          .drop("_file", "_ord")
    }
  }
}
