package graft.tools
import graft.{SparkEntry, Tables}
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession("graft-timeq")
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    for (name <- args.drop(1); i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"[timeq] $name%-24s run$i rows=$n%8d t=${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.stop()
  }
}
