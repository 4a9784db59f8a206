package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical-layout helpers for the 100 TB posture: bucketed and
  * partitioned table layouts that let repeated joins/aggregations on the
  * same key run shuffle-free (SURVEY §2.3 "co-located joins via
  * bucketing").
  *
  * Bucketing writes each table pre-hashed into N buckets on the join key;
  * a join of two tables bucketed the same way needs NO Exchange on either
  * side — at cluster scale that removes the dominant cost of fact-fact
  * joins that recur per pipeline run (e.g. lineitem ⋈ orders in every
  * revenue query, or doc ⋈ doc-features in a training pipeline).
  */
object Layout {

  /** Persist `df` as a bucketed+sorted managed table on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two co-bucketed tables on their bucket key — plans as a
    * sort-merge join with zero shuffle when both sides share bucket
    * count/key.
    */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Partitioned-directory layout (partition pruning for selective scans):
    * one directory per distinct value of `partCol`.
    */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(path)
}
