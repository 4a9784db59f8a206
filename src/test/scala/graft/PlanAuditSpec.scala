package graft

import org.apache.spark.sql.functions._

import graft.tools.PlanAudit

/** The standing structural scale gate (r12 verdict #2): every query on
  * the board must plan free of cartesians, corpus-sized single-partition
  * windows, and shuffle joins against declared dimension tables — and
  * the gate itself is negative-tested (the OracleLintSpec discipline) so
  * a silent detector regression can't turn it into a rubber stamp.
  */
class PlanAuditSpec extends SparkSpec {
  import spark.implicits._

  test("audit self-test: the q266 class (global row_number over a corpus table) is caught") {
    // exactly the plan shape the r12 verdict flagged: a partition-less
    // window whose input is a full fact-table scan
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val bad = docs.withColumn("_ord", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy("doc_id")))
    val v = PlanAudit.violations("fixture_global_window", bad)
    assert(v.exists(_.contains("partition-less Window")), v.toString)
    // the two-phase replacement the repo actually uses passes
    val good = graft.operators.Ranking.withGlobalRowNumber(
      docs.select("doc_id"), Seq("doc_id"))
    assert(PlanAudit.violations("fixture_two_phase", good).isEmpty)
  }

  test("audit self-test: CartesianProduct and dimension-side shuffle joins are caught") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val nation = spark.read.parquet(s"${sf()}/nation.parquet")
    // shuffle_replicate_nl pins the physical CartesianProduct the gate
    // must reject (an unhinted tiny cross join would broadcast)
    val cart = li.select("l_orderkey")
      .crossJoin(nation.select("n_nationkey").hint("shuffle_replicate_nl"))
    assert(PlanAudit.violations("fixture_cartesian", cart)
      .exists(_.contains("CartesianProduct")))
    // hint("merge") forces a SortMergeJoin — the shape the gate must
    // reject when one side scans only region/nation
    val smjDim = li.join(nation.hint("merge"),
      li("l_suppkey") % 25 === nation("n_nationkey"))
    assert(PlanAudit.violations("fixture_dim_smj", smjDim)
      .exists(_.contains("dimension-only")))
    // the correct broadcast form passes
    val bhj = li.join(broadcast(nation),
      li("l_suppkey") % 25 === nation("n_nationkey"))
    assert(PlanAudit.violations("fixture_dim_bhj", bhj).isEmpty)
  }

  test("allowlist hygiene: every allowlisted name is a live query") {
    val qs = SparkEntry.queries.keySet
    val stale = PlanAudit.globalWindowAllow.keySet -- qs
    assert(stale.isEmpty, s"allowlist names unknown queries: $stale")
  }

  test("board audit: all queries plan free of cartesians, global windows, dim-side shuffles (sf0.001)") {
    val dir = sf()
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try PlanAudit.violations(name, fn(spark, dir))
        catch { case e: Throwable =>
          Seq(s"$name: query build failed in audit: ${e.getMessage}") }
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
