package graft.tools
import graft.{SparkEntry, Tables}
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = Tables.localSession("graft-planaudit")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    for (name <- args.drop(1)) {
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.executedPlan.toString
      println("shuffles=" + "Exchange hashpartitioning".r.findAllIn(plan).length +
        " bcastEx=" + "BroadcastExchange".r.findAllIn(plan).length +
        " bhj=" + "BroadcastHashJoin".r.findAllIn(plan).length +
        " bnlj=" + "BroadcastNestedLoopJoin".r.findAllIn(plan).length +
        " smj=" + "SortMergeJoin".r.findAllIn(plan).length +
        " cartesian=" + "CartesianProduct".r.findAllIn(plan).length +
        " wscg=" + """\*\(""".r.findAllIn(plan).length)
      if (args.length == 2) println(plan.take(4000))
    }
    spark.stop()
  }
}
