package graft.tools

import java.nio.file.{Files, Paths}

import graft.{SparkEntry, Tables}

/** Dump `explain("formatted")` for a set of queries to files — the
  * r18 optimization round's before/after plan evidence
  * (plans/r18/<query>_<tag>.txt). Args: sfDir outDir tag [names...];
  * no names = every declared query.
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = Tables.localSession("graft-dump-plans")
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          try {
            val df = fn(spark, dir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.write(Paths.get(s"$outDir/${name}_$tag.txt"),
              plan.getBytes("UTF-8"))
            println(s"[plans] wrote $name")
          } catch {
            case e: Throwable =>
              System.err.println(s"[plans] $name failed: ${e.getMessage}")
          }
        case None => System.err.println(s"[plans] unknown query: $name")
      }
    }
    spark.stop()
  }
}
