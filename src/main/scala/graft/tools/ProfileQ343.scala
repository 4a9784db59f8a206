package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Skew

/** q343 evidence run: the salted equi-join vs the PLAIN join on the
  * same inputs and the same terminal aggregate — the remedy's overhead
  * (broadcast fan-out map + explode + wider shuffle key) priced
  * against what it buys (hot keys spread over S tasks). On local[N]
  * with AQE both run; on a real cluster the plain join's hot key is
  * the straggler this operator exists to kill.
  *
  * usage: ProfileQ343 <sfDir> [targetPairs=8]
  */
object ProfileQ343 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val target = if (args.length > 1) args(1).toLong else 8L
    val spark = Tables.localSession("graft-profile-q343")
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_returnflag"), col("l_quantity"))
    val stats = Tables.lineitem(spark, dir).groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_lines"))
    def agg(j: org.apache.spark.sql.DataFrame): Long = {
      val r = j.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          sum(expr("CAST(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100" +
            " AS DECIMAL(38,0)) * n_lines AS DECIMAL(38,0))"))
            .cast("long").as("qq_cents"))
      r.agg(sum(xxhash64(struct(r.columns.map(col): _*)))).head().getLong(0)
    }
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val hPlain = agg(li.join(stats, "l_partkey"))
      val t1 = System.nanoTime()
      val hSalt = agg(Skew.saltedEquiJoin(li, stats, "l_partkey", target))
      val t2 = System.nanoTime()
      println(f"[q343] run$i plain=${(t1 - t0) / 1e9}%6.2f s " +
        f"salted=${(t2 - t1) / 1e9}%6.2f s hashEq=${hPlain == hSalt}")
    }
    spark.stop()
  }
}
