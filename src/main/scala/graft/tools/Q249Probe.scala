package graft.tools
import graft.{SparkEntry, Tables}
object Q249Probe {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession("q249probe")
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val n = SparkEntry.queries("q249_rec_eval")(spark, args.headOption.getOrElse("/tmp/sf3")).count()
    println(f"[probe] q249 rows=$n t=${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
