package graft.tools

import graft.Tables
import graft.operators.{Analytics, Dedup, Graphs, TextAnalysis}
import org.apache.spark.sql.functions._

/** r18 optimization-round phase profiler: attributes the bench cost of
  * the top queries to their internal stages (one noop-style count per
  * stage, two passes so the JIT-warm numbers are visible).
  */
object ProfileR18 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args(1).split(",").toSet else Set("all")
    def on(n: String) = which("all") || which(n)
    val spark = Tables.localSession("profile-r18")
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $label%-36s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    for (pass <- 0 to 1) {
      println(s"[phase] ======== pass $pass ========")

      if (on("q310")) {
        // q310 split: win-table build vs MM rounds
        val li = Tables.lineitem(spark, dir)
          .filter(col("l_suppkey") <= 100)
          .select(col("l_orderkey"), col("l_suppkey"),
            expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100" +
              " AS BIGINT)").as("_p"))
        val wins = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_suppkey") =!= col("b.l_suppkey") &&
            col("a._p") > col("b._p"))
          .groupBy(col("a.l_suppkey").as("winner"),
            col("b.l_suppkey").as("loser"))
          .agg(count(lit(1)).as("n"))
        val w = Dedup.materialize(wins)
        t("q310 wins build")(w.count())
        t("q310 MM fit (6 rounds)")(
          Analytics.bradleyTerryFromWins(w, rounds = 6).count())
      }

      if (on("q292")) {
        val cells = Dedup.materialize(
          Analytics.transitionPairCells(Tables.events(spark, dir)))
        t("q292 transition cells")(cells.count())
        t("q292 power iteration (8 rounds)")(
          Analytics.stationaryFromCells(cells, rounds = 8).count())
      }

      if (on("q237")) {
        t("q237 robustStats full")(
          Analytics.robustStats(Tables.orders(spark, dir),
            "o_orderpriority", "o_totalprice").count())
      }

      if (on("q209")) {
        val docs = Tables.documents(spark, dir)
        t("q209 containmentJoin full")(
          Dedup.containmentJoin(docs, tau = 0.9).count())
      }

      if (on("q157")) {
        t("q157 itemSimilarityTopK full")(
          Graphs.itemSimilarityTopK(Tables.lineitem(spark, dir),
            "l_orderkey", "l_partkey", k = 3).count())
      }

      if (on("q271")) {
        t("q271 textRank full")(
          TextAnalysis.textRankKeywords(Tables.documents(spark, dir)).count())
      }

      if (on("q271ab")) {
        val docs = Tables.documents(spark, dir)
        val ws = docs.select(graft.operators.TextAnalysis.words(col("text"))
          .as("_ws")).filter(size(col("_ws")) >= 2)
        val biOld = ws.select(explode(expr(
          "transform(sequence(0, size(_ws) - 2)," +
            " i -> struct(_ws[i] AS a, _ws[i+1] AS b))")).as("p"))
          .select(col("p.a"), col("p.b"))
          .filter(col("a") =!= col("b"))
        t("q271 edges OLD (union of swap)")(
          biOld.select(col("a").as("src"), col("b").as("dst"))
            .unionByName(biOld.select(col("b").as("src"), col("a").as("dst")))
            .groupBy("src", "dst")
            .agg(least(count(lit(1)), lit(100000L)).as("weight")).count())
        val biNew = ws.select(explode(expr(
          "flatten(transform(sequence(0, size(_ws) - 2)," +
            " i -> array(struct(_ws[i] AS a, _ws[i+1] AS b)," +
            " struct(_ws[i+1] AS a, _ws[i] AS b))))")).as("p"))
          .select(col("p.a"), col("p.b"))
          .filter(col("a") =!= col("b"))
        t("q271 edges NEW (one-pass both dirs)")(
          biNew.select(col("a").as("src"), col("b").as("dst"))
            .groupBy("src", "dst")
            .agg(least(count(lit(1)), lit(100000L)).as("weight")).count())
      }

      if (on("q211")) {
        val ew = Graphs.coOccurrenceWeighted(
            Tables.lineitem(spark, dir), "l_orderkey", "l_partkey")
          .withColumn("weight", expr("1000000 div weight"))
        t("q211 edge build (count)")(ew.count())
        t("q211 ssspInt full")(
          Graphs.ssspInt(ew, rounds = 3).count())
      }

      if (on("q203")) {
        val li = Tables.lineitem(spark, dir)
        val seeds = t("q203 seeds (top-3 parts)")(
          Dedup.materialize(li.groupBy("l_partkey")
            .agg(countDistinct("l_orderkey").as("_c"))
            .orderBy(col("_c").desc, col("l_partkey"))
            .limit(3).select(col("l_partkey").as("node"))))
        seeds.count()
        val edges = Graphs.coOccurrenceEdges(
          li, "l_orderkey", "l_partkey", dedup = false)
        t("q203 PPR (2 iters, incl. adjacency)")(
          Graphs.personalizedPageRankInt(edges, seeds, iters = 2).count())
      }

      if (on("q315")) {
        import graft.operators.Similarity
        val e = Tables.embeddings(spark, dir)
        println(s"[phase] q315 corpus rows = ${e.count()}")
        val (cents, assigned0) = t("q315 ivfIndexInt8 build (lazy)")(
          Similarity.ivfIndexInt8(e, 16, 2))
        val assigned = Dedup.materialize(assigned0)
        t("q315 assigned materialize")(assigned.count())
        t("q315 brute truth")(
          Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 20), 5)
            .count())
        t("q315 full ivfProbePlan")(
          Similarity.ivfProbePlan(e, e.filter(col("vec_id") < 20), k = 5,
            nProbes = Seq(1, 2, 4, 8), nCells = 16, iters = 2).count())
      }

      if (on("q209p")) {
        val docs = Tables.documents(spark, dir)
        val dig = graft.plans.GraftExtensions.shingleDigestsNative(
          lower(col("text")), 12)
        val base = Dedup.materialize(docs.select(col("doc_id").as("id"),
            sort_array(array_distinct(dig)).as("toks"))
          .withColumn("s", size(col("toks"))))
        t("q209 base digests")(base.count())
        val toks = base.select(col("id"), col("s"),
          explode(col("toks")).as("hk"))
        val dfreq = toks.groupBy("hk").agg(count(lit(1)).as("df"))
        val wRare = org.apache.spark.sql.expressions.Window
          .partitionBy("id").orderBy("df", "hk")
        val ranked = Dedup.materialize(toks.join(dfreq.hint("merge"), "hk")
          .withColumn("_rn", row_number().over(wRare)))
        t("q209 ranked (tok x df + window)")(ranked.count())
        val tau = 0.9
        val prefix = ranked
          .withColumn("p", col("s") -
            ceil(lit(tau) * col("s") - lit(1e-9)).cast("int") + lit(1))
          .filter(col("_rn") <= col("p"))
          .select(col("id").as("id_a"), col("s").as("s_a"),
            (col("_rn") - 1).as("_pa"), col("hk"))
        val full = ranked.select(col("id").as("id_b"), col("s").as("s_b"),
          (col("_rn") - 1).as("_pb"), col("hk"))
        val cand = Dedup.materialize(prefix.join(full.hint("merge"), "hk")
          .filter(col("id_a") =!= col("id_b"))
          .filter(col("s_b") >= lit(tau) * col("s_a") - lit(1e-9))
          .filter((lit(1) + least(col("s_a") - col("_pa") - 1,
              col("s_b") - col("_pb") - 1)) >= lit(tau) * col("s_a") - lit(1e-9))
          .select("id_a", "id_b")
          .distinct())
        t("q209 candidate pairs")(cand.count())
        println(s"[phase] q209 cand pairs = ${cand.count()}," +
          s" base rows = ${base.count()}")
        t("q209 verify joins (merge, current)")(cand
          .join(base.select(col("id").as("id_a"), col("toks").as("_ta"),
            col("s").as("s_a")).hint("merge"), "id_a")
          .join(base.select(col("id").as("id_b"), col("toks").as("_tb"))
            .hint("merge"), "id_b")
          .withColumn("inter", graft.plans.GraftExtensions
            .sortedIntersectNative(col("_ta"), col("_tb")))
          .filter(col("inter").cast("double") / col("s_a") >= tau)
          .count())
        t("q209 verify joins (double-bcast cand)") {
          val j1 = base.select(col("id").as("id_a"), col("toks").as("_ta"),
              col("s").as("s_a"))
            .join(broadcast(cand), Seq("id_a"))
          val j2 = base.select(col("id").as("id_b"), col("toks").as("_tb"))
            .join(broadcast(cand), Seq("id_b"))
            .select("id_a", "id_b", "_tb")
          j1.join(j2, Seq("id_a", "id_b"))
            .withColumn("inter", graft.plans.GraftExtensions
              .sortedIntersectNative(col("_ta"), col("_tb")))
            .filter(col("inter").cast("double") / col("s_a") >= tau)
            .count()
        }
        t("q209 verify joins (shuffle_hash)")(cand
          .join(base.select(col("id").as("id_a"), col("toks").as("_ta"),
            col("s").as("s_a")).hint("shuffle_hash"), "id_a")
          .join(base.select(col("id").as("id_b"), col("toks").as("_tb"))
            .hint("shuffle_hash"), "id_b")
          .withColumn("inter", graft.plans.GraftExtensions
            .sortedIntersectNative(col("_ta"), col("_tb")))
          .filter(col("inter").cast("double") / col("s_a") >= tau)
          .count())
        // ranked-join variant: shuffle_hash dfreq instead of merge
        val ranked2 = Dedup.materialize(toks
          .join(dfreq.hint("shuffle_hash"), "hk")
          .withColumn("_rn", row_number().over(wRare)))
        t("q209 ranked (shuffle_hash dfreq)")(ranked2.count())
        t("q209 verify joins (shuffle_hash CAND build)")(cand
          .hint("shuffle_hash")
          .join(base.select(col("id").as("id_a"), col("toks").as("_ta"),
            col("s").as("s_a")), "id_a")
          .hint("shuffle_hash")
          .join(base.select(col("id").as("id_b"), col("toks").as("_tb")),
            "id_b")
          .withColumn("inter", graft.plans.GraftExtensions
            .sortedIntersectNative(col("_ta"), col("_tb")))
          .filter(col("inter").cast("double") / col("s_a") >= tau)
          .count())
      }

      if (on("q237p")) {
        val base = Dedup.materialize(Tables.orders(spark, dir)
          .filter(col("o_totalprice").isNotNull)
          .select(col("o_orderpriority").as("_g"),
            (col("o_totalprice").cast("decimal(18,4)") * 10000)
              .cast("long").as("_x")))
        t("q237 base materialize")(base.count())
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("_g").orderBy("_x")
        val ranked = Dedup.materialize(base
          .withColumn("_rn", row_number().over(w).cast("long"))
          .withColumn("_n", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("_g"))))
        t("q237 ranked materialize")(ranked.count())
        t("q237 full robustStats")(
          Analytics.robustStats(Tables.orders(spark, dir),
            "o_orderpriority", "o_totalprice").count())
      }

      if (on("lsh")) {
        val docs = Tables.documents(spark, dir)
        val cands = t("lsh minhashCandidates(32,4)")(
          Dedup.materialize(Dedup.minhashCandidates(docs, numHashes = 32,
            rowsPerBand = 4, k = 5, threshold = 0.5,
            collapseExact = false)))
        cands.count()
        t("lsh clusterPairs distributed")(
          Dedup.clusterPairs(cands, driverMaxEdges = 0).count())
        t("q154 clusterReport full")(
          Dedup.clusterReport(docs, numHashes = 32, rowsPerBand = 4,
            k = 5, threshold = 0.5, driverMaxEdges = 0).count())
      }

      if (on("q211b")) {
        // edge build alone, then sssp on a PRE-materialized edge table
        val ew = Dedup.materialize(Graphs.coOccurrenceWeighted(
            Tables.lineitem(spark, dir), "l_orderkey", "l_partkey")
          .withColumn("weight", expr("1000000 div weight")))
        t("q211b edges materialize")(ew.count())
        t("q211b sssp rounds only")(
          Graphs.ssspInt(ew, rounds = 3).count())
      }

      Dedup.releaseCheckpoints()
    }
    spark.stop()
  }
}
