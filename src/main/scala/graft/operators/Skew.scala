package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy aggregations (SURVEY "salting for skew").
  *
  * A `groupBy(key).agg(...)` over a key with a few hot values sends each
  * hot key's entire volume to one reducer. Salted two-phase aggregation
  * splits every key into `saltBuckets` sub-keys (uniform map-side spray),
  * partially aggregates, then re-aggregates the partials — the hot key's
  * work spreads over `saltBuckets` tasks and the second shuffle only
  * carries pre-aggregated partials. AQE's skew-join handling covers
  * joins; this covers aggregations, where AQE does not re-split.
  *
  * Correct only for algebraic aggregates (sum/count/min/max — anything
  * with an associative merge); the API takes (partial, merge) pairs.
  */
object Skew {

  /** salted sum/count aggregation: returns `keyCols ++ [sum_<col>, n]`. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      saltBuckets: Int = 32): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pn"))
      .groupBy(col(key))
      .agg(sum("_psum").as(s"sum_$valueCol"), sum("_pn").as("n"))
  }

  /** General salted two-phase aggregation: `partials` run per
    * (key, salt), `merges` combine partials per key. Each merge must be
    * the associative combiner of its partial (sum↔sum, min↔min, ...).
    */
  def saltedAgg(df: DataFrame, key: String, saltBuckets: Int,
      partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy(col(key), col("_salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(merges.head, merges.tail: _*)
  }

  /** Salted equi-join — the EXECUTOR of [[Validation.saltPlan]]'s
    * remedy, completing the skew tier: q68 salts aggregations, q328
    * audits the join, q339 plans it, this RUNS it. Per hot key (pair
    * product > `targetPairs`, fan-out from the plan's ONE formula
    * site, [[Validation.withFanout]]): the bigger side's rows each
    * take one hash salt in [0, S), the smaller side's rows replicate
    * across all S salts, and the join runs on (key, salt) — so the
    * hot key's pairs spread over S tasks instead of one. Every (l, r)
    * pair appears EXACTLY once (the split side takes exactly one
    * salt; the replicate side covers all of them), so the result is
    * the plain join row-for-row — spec-gated by multiset equality.
    * Cold keys pass through with salt 0 on both sides.
    *
    * Column names must be disjoint apart from the key (pre-rename for
    * self-joins) and must avoid the reserved working names `_salt`,
    * `_hk`, `_fan`, `_left_big`, `_rr` (a silent withColumn overwrite
    * would corrupt the output) — both REQUIREd loudly.
    *
    * Grid-flagged keys (n_small > targetPairs — one-sided salting
    * cannot reach the target; [[Validation.saltPlan]] reports them as
    * `n_grid_keys`) would execute at the one-sided floor S = n_big,
    * replicating every small-side row n_big times — the full pair
    * product as replicated rows. That explosion must be priced off the
    * plan, not discovered mid-shuffle, so the executor REFUSES them
    * unless `allowGridKeys = true` (the caller has read the plan and
    * accepts the floor). The guard costs one count over the
    * already-materialized cells table.
    *
    * Scale shape: the hot-key map is the |hot keys|-row slice of the
    * skew cells (tiny by the definition of skew) and BROADCASTS to
    * both sides; the replicate side grows by Σ(S−1)·n_small — the
    * plan's `total_repl_rows`, priced BEFORE running; the shuffle key
    * becomes (key, salt) so AQE-invisible single-key hotspots split.
    * The split side salts by row position (`monotonically_increasing_
    * id() mod S` — round-robin within each scan partition, the
    * balanced assignment the plan's residual bound assumes; a
    * content hash would collapse to ONE salt whenever non-key columns
    * are absent or constant within a key). The salt is layout-
    * dependent; the OUTPUT is not (every pair appears exactly once
    * whatever salt each row took).
    */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, keyCol: String,
      targetPairs: Long, allowGridKeys: Boolean = false): DataFrame = {
    val overlap = (left.columns.toSet & right.columns.toSet) - keyCol
    require(overlap.isEmpty,
      s"saltedEquiJoin needs disjoint non-key columns; shared: " +
        s"${overlap.toSeq.sorted.mkString(", ")} — rename before joining")
    val reserved = Set("_salt", "_hk", "_fan", "_left_big", "_rr")
    val taken = (left.columns.toSet | right.columns.toSet) & reserved
    require(taken.isEmpty,
      s"saltedEquiJoin reserves working columns ${reserved.toSeq.sorted
        .mkString(", ")}; input carries ${taken.toSeq.sorted
        .mkString(", ")} — rename before joining")
    val fanned = graft.operators.Validation
      .withFanout(Validation.joinSkewCells(left, right, keyCol), targetPairs)
    if (!allowGridKeys) {
      // cells are materialized by joinSkewCells — this is a cells-sized
      // count, not a corpus scan
      val nGrid = fanned.filter(col("_grid") === 1L).count()
      require(nGrid == 0L,
        s"saltedEquiJoin: $nGrid grid key(s) have n_small > targetPairs" +
          s" = $targetPairs — one-sided salting executes them at the" +
          s" S = n_big floor (full pair product as replicated rows)." +
          s" Read Validation.saltPlan's n_grid_keys, then pass" +
          s" allowGridKeys = true to accept the floor or grid-salt" +
          s" those keys separately")
    }
    val hot = fanned
      .filter(col("_s") > 1)
      .select(col("key").as("_hk"), col("_s").cast("long").as("_fan"),
        (col("n_left") >= col("n_right")).as("_left_big"))
    def salted(df: DataFrame, isLeft: Boolean): DataFrame = {
      val splits = if (isLeft) col("_left_big") else !col("_left_big")
      val salts = when(col("_fan").isNull, array(lit(0L)))
        .when(splits, array(col("_rr")))
        .otherwise(sequence(lit(0L), col("_fan") - 1))
      df.join(broadcast(hot), col(keyCol).cast("long") <=> col("_hk"),
          "left")
        // nondeterministic exprs live in a Project, not under the
        // Generate: the round-robin position is taken here, the
        // explode below only references the materialized column
        .withColumn("_rr", pmod(monotonically_increasing_id(),
          coalesce(col("_fan"), lit(1L))))
        .withColumn("_salt", explode(salts))
        .drop("_hk", "_fan", "_left_big", "_rr")
    }
    salted(left, isLeft = true)
      .join(salted(right, isLeft = false), Seq(keyCol, "_salt"))
      .drop("_salt")
  }
}
