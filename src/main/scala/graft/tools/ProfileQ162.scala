package graft.tools

import graft.{SparkEntry, Tables}

/** Cold + warm timing of q162 as the bench runs it. */
object ProfileQ162 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.localSession("profile-q162")
    spark.sparkContext.setLogLevel("WARN")
    for (k <- 0 to 3) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("q162_triangles")(spark, dir).count()
      println(f"[prof] run $k: ${(System.nanoTime() - t0) / 1e9}%.3f s (rows $n)")
    }
    spark.stop()
  }
}
