package graft.operators

import org.apache.spark.sql.functions._

import graft.core.{DabDataset, DabOp, SelectOp, SplitOp}
import graft.functions.{Chain, Processor}

/** Feature materialization (reference `prepare_feat`,
  * dabstract/dataset/dataset.py:703-928) and eager loading
  * (`load_memory`, dataset.py:555-626).
  *
  * The reference's flow — pop-dive to the source table, run the chain
  * per file with a worker pool, save one .npy per row, rebuild a lazy
  * table, replay recorded selects/splits — collapses in Spark to:
  * select(chain) → write parquet (idempotent) → read parquet → replay
  * op-log filters. Executor parallelism replaces the worker pool; the
  * per-row `info` pickle becomes an `info` struct column in the same
  * parquet.
  */
object Features {

  /** Run `chain` over `dataCol` and persist the result as a feature
    * parquet at `featPath`; returns the dataset with the feature table
    * read back lazily under `newKey`. Idempotent like the reference's
    * existence check (dataset.py:832-841): an existing feature dir is
    * reused, not recomputed.
    */
  def prepareFeat(ds: DabDataset, dataCol: String, infoCol: Option[String],
      chain: Chain, newKey: String, featPath: String,
      overwrite: Boolean = false): DabDataset = {
    val spark = ds.spark
    val exists = try {
      spark.read.parquet(featPath).schema.nonEmpty && !overwrite
    } catch { case _: Throwable => false }
    if (!exists) {
      val info = infoCol.map(col).getOrElse(Processor.emptyInfo)
      val fitted = chain.fit(ds.df, dataCol)
      val (feat, featInfo) = fitted(col(dataCol), info)
      ds.df.select(col(DabDataset.IdxCol), feat.as(newKey), featInfo.as(s"${newKey}_info"))
        .write.mode(if (overwrite) "overwrite" else "ignore").parquet(featPath)
    }
    val featDf = spark.read.parquet(featPath)
    // replay: positions in the feature parquet are the source positions,
    // so a plain _idx equi-join re-applies every recorded select/split
    // (the op-log already shaped ds.df itself).
    ds.addDict(DabDataset.fromExisting(featDf))
  }
}
