package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column utilities for ANN/similarity pipelines over an
  * `embedding: array<float>` column: exact L2 normalization (after which
  * cosine = dot — the cheap form every ANN stage wants) and symmetric
  * int8 quantization (max-abs scale per vector), the standard 4× memory
  * cut for corpus-side vectors at 100 TB.
  *
  * Everything here is a pure Catalyst expression pipeline — codegen'd,
  * map-side, zero shuffle; the only per-row state is one extra column
  * (`_l2` / `_ma`) so the norm/scale folds run once per row, not once
  * per element. Folds accumulate in array order with double arithmetic,
  * so results are bit-identical across engines and cluster sizes (the
  * property the DuckDB oracle checks).
  */
object Embeddings {

  /** Exact L2 norm: sequential sum-of-squares fold in array order. */
  def l2Norm(vec: Column): Column =
    sqrt(aggregate(vec, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Append `outCol` = vec/‖vec‖ (as array<double>); zero vectors pass
    * through unscaled instead of dividing by zero.
    */
  def withL2Normalized(df: DataFrame, vecCol: String = "embedding",
      outCol: String = "unit"): DataFrame =
    df.withColumn("_l2", l2Norm(col(vecCol)))
      .withColumn(outCol,
        when(col("_l2") === 0.0, transform(col(vecCol), x => x.cast("double")))
          .otherwise(transform(col(vecCol), x => x.cast("double") / col("_l2"))))
      .drop("_l2")

  /** Append `qCol` = round(vec × `scaleCol`) as array<int> with
    * `scaleCol` = 127 / max|vec| (1.0 for the zero vector): symmetric
    * per-vector int8 quantization. Rounding is floor(x+0.5) — half-up,
    * IEEE-identical on any engine — and |q| ≤ 127 by construction.
    */
  def withInt8Quantized(df: DataFrame, vecCol: String = "embedding",
      qCol: String = "q", scaleCol: String = "scale"): DataFrame =
    df.withColumn("_ma",
        coalesce(array_max(transform(col(vecCol), x => abs(x.cast("double")))), lit(0.0)))
      .withColumn(scaleCol,
        when(col("_ma") === 0.0, lit(1.0)).otherwise(lit(127.0) / col("_ma")))
      .withColumn(qCol,
        transform(col(vecCol), x =>
          floor(x.cast("double") * col(scaleCol) + 0.5).cast("int")))
      .drop("_ma")

  /** Reconstruct approximate doubles from a quantized vector: q / scale.
    * Max per-element error is 0.5/scale = max|vec|/254.
    */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, v => v.cast("double") / scale)
}
