package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Measures the driver-union-find vs distributed-pointer-doubling
  * crossover for [[Dedup.clusterPairs]], to ground the
  * `spark.graft.dedup.driverMaxEdges` default (100k) in a number
  * instead of a guess (round-9 verdict item #7).
  *
  * Synthetic graph: E edges over E/2 nodes arranged as many short
  * chains plus one long path (mixed component diameters — the worst
  * reasonable case for pointer doubling's round count without being
  * adversarial). Both paths run on identical input; wall time is
  * median of 3 after a warm run.
  */
object ComponentsCrossover {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def edgeSet(e: Int): org.apache.spark.sql.DataFrame = {
      // chains of length 10 over ids [0, e), plus one path over every
      // 1000th id to give a diameter ~e/1000
      val chains = spark.range(0, e)
        .filter(col("id") % 10 =!= 9L)
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      val longPath = spark.range(0, e / 1000)
        .select((col("id") * 1000).as("id_a"),
          ((col("id") + 1) * 1000).as("id_b"))
      chains.union(longPath).localCheckpoint(eager = true)
    }

    def time(f: => Long): Double = {
      f // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      runs.sorted.apply(1)
    }

    println("edges,driver_sec,distributed_sec")
    Seq(10000, 50000, 100000, 300000, 1000000, 3000000).foreach { e =>
      val edges = edgeSet(e)
      val dDriver = time(
        Dedup.clusterPairs(edges, driverMaxEdges = 100000000).count())
      val dDist = time(
        Dedup.clusterPairs(edges, driverMaxEdges = 0).count())
      println(f"$e,$dDriver%.2f,$dDist%.2f")
      edges.unpersist(blocking = true)
    }
    spark.stop()
  }
}
