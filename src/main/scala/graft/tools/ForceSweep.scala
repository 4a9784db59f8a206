package graft.tools

import org.apache.spark.sql.functions.{col, struct, sum, xxhash64}

import graft.{SparkEntry, Tables}

/** Forcing variant of [[ScaleSweep]]: `count()` lets Catalyst prune
  * every projected column, so a row-level query (q22 stats, q23
  * langid, q66 quality) measures as scan-speed no matter how
  * expensive its expressions are — the blind spot that hid the langId
  * 6× re-tokenization until an AGGREGATING consumer (q314) exposed
  * it. This sweep hashes every output column into one sum, so the
  * whole projection must actually evaluate.
  *
  * Usage: runMain graft.tools.ForceSweep <sfDir> <query> [query ...]
  */
object ForceSweep {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ForceSweep <sfDir> <query> [query ...]")
    val dir = args.head
    val spark = Tables.localSession("graft-forcesweep")
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args.tail) {
      SparkEntry.queries.get(name) match {
        case None => println(f"[force] $name%-28s UNKNOWN QUERY")
        case Some(fn) =>
          val t0 = System.nanoTime()
          val df = fn(spark, dir)
          val h = df.select(xxhash64(struct(df.columns.map(col): _*))
              .cast("decimal(38,0)").as("_h"))
            .agg(sum("_h")).collect()(0)
          println(f"[force] $name%-28s hash=${h.get(0)}%20s " +
            f"t=${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
    }
    spark.stop()
  }
}
