package graft.tools

import graft.Tables

/** Build a pathological N-rows-per-table slice of a testdata dir — the
  * r11 degenerate-input sweep's dataset, reconstructible on demand:
  * single-member groups, empty join sides, and zero-variance columns
  * are exactly what flushes ANSI DIVIDE_BY_ZERO and NULL-statistic
  * classes out of new operators. Slices by the table's natural id
  * order (deterministic — not a sample).
  *
  * usage: TinySlice <srcDir> <outDir> [rowsPerTable=3]
  */
object TinySlice {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TinySlice <srcDir> <outDir> [rows]")
    val (src, out) = (args(0), args(1))
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = Tables.localSession("graft-tinyslice")
    spark.sparkContext.setLogLevel("WARN")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    for (t <- tables) {
      val df = t match {
        // events must go through the ts normalizer like every consumer
        case "events" => Tables.events(spark, src)
        case _ => spark.read.parquet(s"$src/$t.parquet")
      }
      val ordered = df.orderBy(df.columns.head, df.columns.tail: _*)
        .limit(n)
      ordered.coalesce(1).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
      println(s"[tiny] $t -> $n rows")
    }
    spark.stop()
  }
}
