package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Graphs

/** Engine-side 10×+ gate for q179 where the unrolled DuckDB replay is
  * intractable (the frontier NOT-INs spill unboundedly at 6M-lineitem
  * co-occurrence scale). BFS layers from a landmark are FULLY
  * characterized by local invariants, each checkable with one join:
  *   (1) exactly one hop-0 node = min(src) of the edge set;
  *   (2) every node at hop h>0 has minimum-neighbour-hop h−1
  *       (reached no earlier, reachable from the previous layer);
  *   (3) no unreached node neighbours a node at hop < maxHops
  *       (nothing within range was missed).
  */
object BfsCrossCheck {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession("graft-bfs-xcheck")
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val maxHops = 3
    val edges = Graphs.coOccurrenceEdges(
      Tables.lineitem(spark, dir), "l_orderkey", "l_partkey")
      .localCheckpoint()
    val dist = Graphs.bfsHops(edges, maxHops = maxHops).localCheckpoint()
    val landmark = edges.agg(min("src")).head.getLong(0)
    val l0 = dist.filter(col("hops") === 0).collect()
    val nbrHop = edges
      .join(dist.select(col("node").as("dst"), col("hops").as("_dh")), "dst")
      .groupBy(col("src").as("node")).agg(min("_dh").as("min_nbr_hop"))
    val bad2 = dist.filter(col("hops") > 0)
      .join(nbrHop, "node")
      .filter(col("min_nbr_hop") =!= col("hops") - 1).count()
    val missed = nbrHop
      .join(dist.select("node"), Seq("node"), "anti")
      .filter(col("min_nbr_hop") < maxHops).count()
    println(s"[bfs-xcheck] n=${dist.count()} layer0=${l0.map(_.getLong(0)).mkString} " +
      s"landmark=$landmark bad_layers=$bad2 missed_in_range=$missed")
    assert(l0.length == 1 && l0.head.getLong(0) == landmark)
    assert(bad2 == 0 && missed == 0)
    println("[bfs-xcheck] OK")
    spark.stop()
  }
}
