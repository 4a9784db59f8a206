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

  /** Pairwise cosine between per-label centroids in the int8-quantized
    * space — "how far apart do the classes / days / sources sit", the
    * embedding-drift readout. cosine(Σv) ≡ cosine(centroid), so the
    * centroids are never materialized: per-(label, dim) integer sums
    * (exact), then exact long dot/norms per label pair and ONE IEEE
    * sqrt+divide — engine-identical (the q57/q81 integer discipline).
    *
    * Scale shape: one explode + partial-agg'd groupBy(label, dim), a
    * label-sized collect per label, and a label×label broadcast join —
    * nothing pairwise ever touches row counts.
    */
  def labelCentroidCosines(df: DataFrame, labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame = {
    val q = withInt8Quantized(df, vecCol)
    val sums = q.select(col(labelCol).as("_lab"), posexplode(col("q")))
      .groupBy(col("_lab"), col("pos"))
      .agg(sum(col("col").cast("long")).as("_v"))
      .groupBy("_lab")
      .agg(sort_array(collect_list(struct(col("pos"), col("_v")))).as("_sv"))
      .select(col("_lab"), transform(col("_sv"), x => x("_v")).as("_svec"))
    def ldot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, r) => p * r), lit(0L), (acc, v) => acc + v)
    val a = sums.select(col("_lab").as("label_a"), col("_svec").as("_va"))
    val b = sums.select(col("_lab").as("label_b"), col("_svec").as("_vb"))
    a.join(broadcast(b), col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"),
        (ldot(col("_va"), col("_vb")).cast("double") /
          (sqrt(ldot(col("_va"), col("_va")).cast("double")) *
            sqrt(ldot(col("_vb"), col("_vb")).cast("double")))).as("cosine"))
  }

  /** Seeded ±1 random projection (the JL / sign-matrix reduction every
    * billion-vector ANN pre-pass wants): out[j] = Σ_d sign(seed,j,d) ·
    * q[d] over the int8-quantized vector, with sign = +1 iff
    * splitmix64(seed + j·inDim + d) ≥ 0 as a SIGNED long. Everything
    * is integer-exact — quantization is [[withInt8Quantized]]'s
    * half-up rule, the projection matrix is a pure hash function of
    * (seed, j, d), and each output is a bounded integer sum (|out| ≤
    * 127·inDim) — so the DuckDB oracle replays the whole thing
    * bit-for-bit (q210).
    *
    * Scale shape: the outDim×inDim sign matrix folds in as LITERALS
    * (driver-computed, a few KB) — map-side, zero shuffle, codegen'd;
    * no broadcast, no join. Output is exploded (id, dim, value) — the
    * layout a downstream banded-LSH bucketing or per-dim index
    * consumes. Rows whose vector is null or not `inDim` wide are
    * dropped (the ANN-path null convention).
    */
  def randomProjection(df: DataFrame, outDim: Int = 16, seed: Long = 2026L,
      inDim: Int = 64, vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val q = withInt8Quantized(
      df.filter(col(vecCol).isNotNull && size(col(vecCol)) === inDim), vecCol)
    val projCols = (0 until outDim).map { j =>
      val signs = array((0 until inDim).map { d =>
        lit(if (graft.functions.Hashing.splitmix64(
          seed + j.toLong * inDim + d) >= 0L) 1L else -1L)
      }: _*)
      aggregate(zip_with(col("q"), signs, (x, sg) => x.cast("long") * sg),
        lit(0L), (acc, v) => acc + v).as(s"_p$j")
    }
    q.select(col(idCol) +: projCols: _*)
      .select(col(idCol),
        posexplode(array((0 until outDim).map(j => col(s"_p$j")): _*)))
      .select(col(idCol), col("pos").cast("long").as("dim"),
        col("col").as("value"))
  }
}
