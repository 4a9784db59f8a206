package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Sampling, Validation}

/** True multi-trigger convergence for the r12 streaming twins (r12
  * verdict #5): the driver gate runs each twin once via AvailableNow
  * over parquet, which exercises the state store but only ONE trigger
  * boundary. These specs push data through `MemoryStream` in several
  * triggers and assert that AFTER EVERY TRIGGER the streamed cells
  * equal the batch cell builder applied to the union of data seen so
  * far — the funnelStream discipline, applied to the shared-cells
  * twins (q272 calibration, q279 Benford, q280 mixture).
  */
class StreamingTwinsSpec extends SparkSpec {
  import spark.implicits._

  /** Run `transform` over a MemoryStream in Complete mode, feeding
    * `batches` one trigger at a time; after each trigger call `check`
    * with (sink table, rows seen so far).
    */
  private def convergeByTrigger[T <: Product : org.apache.spark.sql.Encoder](
      cols: Seq[String], batches: Seq[Seq[T]], sinkName: String,
      transform: DataFrame => DataFrame)(
      check: (DataFrame, Seq[T]) => Unit): Unit = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[T]
    val q = transform(input.toDF().toDF(cols: _*))
      .writeStream.format("memory").queryName(sinkName)
      .outputMode("complete").start()
    try {
      var seen = Seq.empty[T]
      for (b <- batches) {
        input.addData(b: _*)
        q.processAllAvailable()
        seen = seen ++ b
        check(spark.table(sinkName), seen)
      }
    } finally q.stop()
  }

  private def cellMap(df: DataFrame): Map[Seq[Any], Seq[Any]] =
    df.collect().toSeq.map { r =>
      val v = r.toSeq; Seq(v.head) -> v.tail
    }.toMap

  test("q272 twin: calibration cells converge to the batch builder at every trigger") {
    val batches = Seq(
      Seq((500L, true), (2500L, false), (9800L, true)),
      Seq((2600L, true), (500L, false)),            // merges into bins 0 and 2
      Seq((10000L, true), (0L, false), (5000L, false))) // edge bins
    convergeByTrigger[(Long, Boolean)](Seq("p_q4", "y"), batches,
      "twin_calib",
      df => Analytics.calibrationCells(df, "p_q4", col("y"))) {
      (sink, seen) =>
        val batch = Analytics.calibrationCells(
          seen.toDF("p_q4", "y"), "p_q4", col("y"))
        assert(cellMap(sink) == cellMap(batch))
    }
    // and the shared readout: final streamed cells through
    // calibrationFromCells equal the one-shot batch calibrationCurve
    val all = batches.flatten
    val streamedFinal = Analytics.calibrationFromCells(
      Analytics.calibrationCells(all.toDF("p_q4", "y"), "p_q4", col("y")))
    val direct = Analytics.calibrationCurve(
      all.toDF("p_q4", "y"), "p_q4", col("y"))
    assert(streamedFinal.orderBy("bin").collect().toSeq ==
      direct.orderBy("bin").collect().toSeq)
  }

  test("q279 twin: Benford digit cells converge to the batch builder at every trigger") {
    val batches = Seq(
      Seq(123.45, 19.99, 1.02),        // digits 1,1,1
      Seq(0.004, 900.0, 23.5),         // sub-cent drop + 9 + 2
      Seq(345.0, 0.0, 81.81))          // 3, zero drop, 8
    convergeByTrigger[Tuple1[Double]](Seq("v"),
      batches.map(_.map(Tuple1(_))), "twin_benford",
      df => Validation.benfordDigitCells(df, "v")) { (sink, seen) =>
      val batch = Validation.benfordDigitCells(
        seen.map(_._1).toDF("v"), "v")
      assert(cellMap(sink) == cellMap(batch))
    }
  }

  test("q280 twin: domain token cells converge to the batch builder at every trigger") {
    val batches = Seq(
      Seq(("web", 100L), ("books", 40L)),
      Seq(("web", 25L), ("code", 7L)),
      Seq(("books", 3L), ("web", 1L)))
    convergeByTrigger[(String, Long)](Seq("source", "n_chars"), batches,
      "twin_mixture",
      df => Sampling.domainTokenCells(df)) { (sink, seen) =>
      val batch = Sampling.domainTokenCells(seen.toDF("source", "n_chars"))
      assert(cellMap(sink) == cellMap(batch))
    }
    // readout parity on the final cells
    val targets = Seq(("web", 600L), ("books", 300L), ("code", 100L))
    val all = batches.flatten.toDF("source", "n_chars")
    val a = Sampling.mixturePlanFromCells(
      Sampling.domainTokenCells(all), targets).orderBy("source")
    val b = Sampling.domainMixturePlan(all, targets).orderBy("source")
    assert(a.collect().toSeq == b.collect().toSeq)
  }

  test("q285 twin: digest cells converge to the batch builder at every trigger") {
    val batches = Seq(
      Seq(Tuple1("x"), Tuple1("x"), Tuple1("y")),
      Seq(Tuple1("x"), Tuple1("z")),      // grows the x cluster to 3
      Seq(Tuple1("y"), Tuple1("y")))      // grows y to 3
    convergeByTrigger[Tuple1[String]](Seq("text"), batches,
      "twin_dupinf",
      df => graft.operators.Dedup.digestCells(df)) { (sink, seen) =>
      val batch = graft.operators.Dedup.digestCells(
        seen.map(_._1).toDF("text"))
      assert(cellMap(sink) == cellMap(batch))
    }
    // final cells through the shared histogram readout == one-shot batch
    val all = batches.flatten.map(_._1).toDF("text")
    val viaCells = graft.operators.Dedup.dupInflationFromCells(
      graft.operators.Dedup.digestCells(all)).orderBy("cluster_size")
    val direct = graft.operators.Dedup.dupInflation(all)
      .orderBy("cluster_size")
    assert(viaCells.collect().toSeq == direct.collect().toSeq)
  }

  test("q290 twin: k-anonymity cells converge to the batch builder at every trigger") {
    val batches = Seq(
      Seq((1L, "A"), (2L, "A"), (1L, "B")),
      Seq((1L, "A"), (3L, "C")),           // grows (1,A) to 2
      Seq((2L, "A"), (1L, "B")))           // grows (2,A) and (1,B)
    convergeByTrigger[(Long, String)](Seq("nat", "seg"), batches,
      "twin_kanon",
      df => graft.operators.Validation.kAnonymityCells(df,
        Seq("nat", "seg"))) { (sink, seen) =>
      val batch = graft.operators.Validation.kAnonymityCells(
        seen.toDF("nat", "seg"), Seq("nat", "seg"))
      val key = (d: org.apache.spark.sql.DataFrame) =>
        d.collect().toSeq.map(r => (r.getLong(0), r.getString(1)) ->
          r.getLong(2)).toMap
      assert(key(sink) == key(batch))
    }
    // final cells through the shared 1-row readout == one-shot batch
    val all = batches.flatten.toDF("nat", "seg")
    val viaCells = graft.operators.Validation.kAnonymityFromCells(
      graft.operators.Validation.kAnonymityCells(all, Seq("nat", "seg")),
      k = 2).collect().toSeq
    val direct = graft.operators.Validation.kAnonymityAudit(
      all, Seq("nat", "seg"), k = 2).collect().toSeq
    assert(viaCells == direct)
  }

  test("q301 twin: PSI-over-time cells converge to the batch builder at every trigger") {
    val batches = Seq(
      Seq((0L, "x"), (0L, "y"), (1L, "x")),
      Seq((1L, "y"), (1L, "y"), (2L, "x")),  // new bucket appears
      Seq((0L, "x"), (2L, "z")))             // new category appears
    convergeByTrigger[(Long, String)](Seq("b", "cat"), batches,
      "twin_psitime",
      df => Analytics.psiTimeCells(df, col("b"), "cat")) {
      (sink, seen) =>
        val batch = Analytics.psiTimeCells(
          seen.toDF("b", "cat"), col("b"), "cat")
        val key = (d: DataFrame) => d.collect().toSeq
          .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
        assert(key(sink) == key(batch))
    }
    // final cells through the shared readout == one-shot batch
    val all = batches.flatten.toDF("b", "cat")
    val viaCells = Analytics.psiVsBaselineFromCells(
        Analytics.psiTimeCells(all, col("b"), "cat"))
      .orderBy("bucket").collect().toSeq
    val direct = Analytics.psiVsBaseline(all, col("b"), "cat")
      .orderBy("bucket").collect().toSeq
    assert(viaCells == direct)
  }

  test("q302 twin: token-budget cells converge to the batch builder at every trigger") {
    val batches = Seq(
      Seq(("a", "hello world"), ("b", "abc")),
      Seq(("a", "the cat"), ("c", null: String)), // null-text doc
      Seq(("b", "hello hello hello")))
    convergeByTrigger[(String, String)](Seq("source", "text"), batches,
      "twin_tokbudget",
      df => graft.operators.TextAnalysis.tokenBudgetCells(df)) {
      (sink, seen) =>
        val batch = graft.operators.TextAnalysis.tokenBudgetCells(
          seen.toDF("source", "text"))
        val key = (d: DataFrame) => d.collect().toSeq
          .map(r => r.getString(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
        assert(key(sink) == key(batch))
    }
    val all = batches.flatten.toDF("source", "text")
    val viaCells = graft.operators.TextAnalysis.tokenBudgetFromCells(
        graft.operators.TextAnalysis.tokenBudgetCells(all))
      .orderBy("source").collect().toSeq
    val direct = graft.operators.TextAnalysis.tokenBudgetBySource(all)
      .orderBy("source").collect().toSeq
    assert(viaCells == direct)
  }

  /** The q311 batch win-table build (within-order self-join: distinct
    * suppliers, strictly higher price wins) on a test frame — the
    * relational truth the q317 streaming twin must converge to.
    */
  private def batchWins(df: DataFrame): DataFrame = {
    val li = df.select(col("l_orderkey"), col("l_suppkey"),
      expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100" +
        " AS BIGINT)").as("_p"))
    li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_suppkey") =!= col("b.l_suppkey") &&
        col("a._p") > col("b._p"))
      .groupBy(col("a.l_suppkey").as("winner"),
        col("b.l_suppkey").as("loser"))
      .agg(count(lit(1)).as("n"))
  }

  test("q317 twin: win-pair cells converge to the batch self-join at every trigger; late lines re-derive") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Option[Long], Option[Long], Option[Double])]
    val cols = Seq("l_orderkey", "l_suppkey", "l_extendedprice")
    val streamed = graft.streaming.EventStreams.winPairsStream(spark,
      input.toDF().toDF(cols: _*))
    val q = streamed.writeStream.format("memory").queryName("win_conv")
      .outputMode("append").start()
    // trigger 1: order 1 = supp 10 @ 5.00 beats supp 20 @ 3.00
    // trigger 2: LATE line supp 30 @ 4.00 into order 1 (pairs against
    //            BOTH buffered lines); order 2 = exact tie, no pair
    // trigger 3: order 2 gains a winner; order 1 gains a SECOND supp-20
    //            line (duplicate-supplier multiplicity) plus NULL
    //            price / NULL suppkey rows that must never pair
    val batches = Seq(
      Seq((Some(1L), Some(10L), Some(5.0)), (Some(1L), Some(20L), Some(3.0))),
      Seq((Some(1L), Some(30L), Some(4.0)),
        (Some(2L), Some(10L), Some(2.0)), (Some(2L), Some(20L), Some(2.0))),
      Seq((Some(2L), Some(30L), Some(2.5)),
        (Some(1L), Some(20L), Some(1.0)),
        (Some(1L), Some(40L), None), (Some(1L), None, Some(9.0)),
        // NULL ORDER KEY lines: the batch self-join key comparison is
        // false on NULL, so these two must NOT pair with each other
        // (the stream would otherwise pool them in one None bucket)
        (None, Some(50L), Some(9.0)), (None, Some(60L), Some(1.0))))
    try {
      var seen = Seq.empty[(Option[Long], Option[Long], Option[Double])]
      for (b <- batches) {
        input.addData(b: _*)
        q.processAllAvailable()
        seen = seen ++ b
        // max-emit consumer (the q317 SparkEntry shape) over the sink
        val fin = spark.table("win_conv")
          .withColumn("_mx", max("emit").over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("l_orderkey")))
          .filter(col("emit") === col("_mx"))
          .groupBy("winner", "loser").agg(sum("n").as("n"))
        val key = (d: DataFrame) => d.collect().toSeq
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
        assert(key(fin) == key(batchWins(seen.toDF(cols: _*))),
          s"streamed cells diverge from batch after ${seen.size} rows")
      }
      // final cells through the SHARED readout == one-shot batch q311
      val finWins = spark.table("win_conv")
        .withColumn("_mx", max("emit").over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("l_orderkey")))
        .filter(col("emit") === col("_mx"))
        .groupBy("winner", "loser").agg(sum("n").as("n"))
      val viaStream = Analytics.winRateMatrix(finWins)
        .orderBy("item_a", "item_b").collect().toSeq
      val direct = Analytics.winRateMatrix(batchWins(
          batches.flatten.toDF(cols: _*)))
        .orderBy("item_a", "item_b").collect().toSeq
      assert(viaStream == direct)
      // the duplicate-supplier multiplicity actually bit: supp 10 beat
      // supp 20 twice in order 1 (3.00 and 1.00 lines)
      assert(viaStream.exists(r => r.getLong(0) == 10L &&
        r.getLong(1) == 20L && r.getLong(2) >= 2L))
      // no cap hit in this test: every emit must say truncated=false
      assert(spark.table("win_conv").filter(col("truncated")).count() == 0L)
    } finally q.stop()
  }

  test("winPairsStream: buffer-cap hits surface as a STICKY truncated flag, never a silent undercount") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Option[Long], Option[Long], Option[Double])]
    val cols = Seq("l_orderkey", "l_suppkey", "l_extendedprice")
    val streamed = graft.streaming.EventStreams.winPairsStream(spark,
      input.toDF().toDF(cols: _*), maxPerKey = 2)
    val q = streamed.writeStream.format("memory").queryName("win_trunc")
      .outputMode("append").start()
    try {
      // trigger 1: order 1 fills the cap exactly (2 lines) — NOT truncated
      input.addData((Some(1L), Some(10L), Some(5.0)),
        (Some(1L), Some(20L), Some(3.0)))
      q.processAllAvailable()
      val t1 = spark.table("win_trunc")
      assert(t1.count() == 1L && t1.filter(col("truncated")).count() == 0L)
      // trigger 2: a third line overflows the cap — the emit (from the
      // surviving buffer) must carry truncated=true even though the
      // dropped line silently changed nothing visible in the counts
      input.addData((Some(1L), Some(30L), Some(4.0)))
      q.processAllAvailable()
      val e2 = spark.table("win_trunc")
        .filter(col("emit") === 2L).collect()
      assert(e2.nonEmpty && e2.forall(_.getAs[Boolean]("truncated")),
        "cap overflow must mark every emitted row truncated")
      // trigger 3: STICKY — a later under-cap batch for the same order
      // still reports truncated (state diverged once, diverged forever)
      input.addData((Some(1L), Some(5L), Some(0.5)))
      q.processAllAvailable()
      val e3 = spark.table("win_trunc")
        .filter(col("emit") === 3L).collect()
      assert(e3.nonEmpty && e3.forall(_.getAs[Boolean]("truncated")),
        "truncated must be sticky across later triggers")
      // an untouched order stays clean: order 2 under cap
      input.addData((Some(2L), Some(10L), Some(2.0)),
        (Some(2L), Some(20L), Some(1.0)))
      q.processAllAvailable()
      val o2 = spark.table("win_trunc").filter(col("l_orderkey") === 2L)
      assert(o2.count() >= 1L && o2.filter(col("truncated")).count() == 0L)
    } finally q.stop()
  }
}
