package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The (c)-tier extension path from SURVEY §2, end to end: a custom
  * LogicalPlan + SparkStrategy + SparkPlan for the backward as-of join
  * — "each left row joins the latest right row of the same key with
  * time ≤ its time". Built-ins can compose it (the q58 union+window
  * formulation), but none EXPRESS it; this node does, and its physical
  * operator is the textbook per-partition merge:
  *
  *  - `requiredChildDistribution` co-partitions both sides on the key
  *    (Catalyst's EnsureRequirements inserts the exchanges — at most
  *    one shuffle per side, none if a side is already key-partitioned);
  *  - `requiredChildOrdering` demands (key, time) sort per partition
  *    (EnsureRequirements inserts the local sorts);
  *  - `doExecute` zips the co-partitioned sides and merges each pair of
  *    sorted streams with one lookahead row and one remembered match —
  *    O(|L|+|R|) per partition, constant memory, no union blow-up, no
  *    window state.
  *
  * Match ties (several right rows at the same admissible time) resolve
  * to the last row in (key, time) sort order — i.e. the maximal time —
  * matching the MAX-based relational oracle. Null keys join nothing
  * (SQL semantics). Unmatched left rows emit nulls on the right.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] to [[AsOfJoinExec]]; injected per-session via
  * `spark.experimental.extraStrategies` (works on ANY session — the
  * driver's Verify/Bench sessions don't install extensions).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoin =>
      AsOfJoinExec(planLater(j.left), planLater(j.right),
        j.leftKey, j.rightKey, j.leftTime, j.rightTime) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(leftKey :: Nil),
    ClusteredDistribution(rightKey :: Nil))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lkE = leftKey; val rkE = rightKey; val ltE = leftTime; val rtE = rightTime
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lk = BindReferences.bindReference(lkE, lOut)
      val lt = BindReferences.bindReference(ltE, lOut)
      val rk = BindReferences.bindReference(rkE, rOut)
      val rt = BindReferences.bindReference(rtE, rOut)
      val keyOrd = TypeUtils.getInterpretedOrdering(lkE.dataType)
      val timeOrd = TypeUtils.getInterpretedOrdering(ltE.dataType)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var curR: InternalRow = _      // lookahead (copied)
        private var curRk: Any = _
        private var curRt: Any = _
        private var lastMatch: InternalRow = _ // latest admissible (copied)
        private var lastMatchKey: Any = _

        private def advanceRight(): Unit = {
          curR = null
          while (curR == null && rIter.hasNext) {
            val r = rIter.next()
            val k = rk.eval(r)
            // null right keys OR null right times join nothing — drop
            // both up front (the interpreted time ordering would NPE
            // on a null operand otherwise).
            if (k != null) {
              val t = rt.eval(r)
              if (t != null) { curR = r.copy(); curRk = k; curRt = t }
            }
          }
        }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val k = lk.eval(l)
          if (k == null) return resultProj(joined(l, nullRight))
          val t = lt.eval(l)
          // a null left time admits no right row: emit null-extended
          // without consuming the right side (order is preserved for
          // the rows that follow).
          if (t == null) return resultProj(joined(l, nullRight))
          var cont = curR != null
          while (cont) {
            val c = keyOrd.asInstanceOf[Ordering[Any]].compare(curRk, k)
            if (c < 0) advanceRight()
            else if (c == 0 &&
                timeOrd.asInstanceOf[Ordering[Any]].lteq(curRt, t)) {
              lastMatch = curR; lastMatchKey = curRk
              advanceRight()
            } else cont = false
            if (curR == null) cont = false
          }
          val m =
            if (lastMatch != null &&
              keyOrd.asInstanceOf[Ordering[Any]].equiv(lastMatchKey, k))
              lastMatch
            else nullRight
          resultProj(joined(l, m))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinNative {
  /** As-of join two DataFrames through the custom plan node. The sides
    * must not share attribute ids (for a self-as-of, read the source
    * twice — each scan mints fresh attributes). Registers the strategy
    * on the session idempotently.
    */
  def join(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    import org.apache.spark.sql.graft.ColumnShim
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lp = leftDf.queryExecution.analyzed
    val rp = rightDf.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${p.output.map(_.name).mkString(", ")}"))
    require(lp.outputSet.intersect(rp.outputSet).isEmpty,
      "as-of sides share attribute ids — re-read the source for self-joins")
    ColumnShim.ofRows(spark, AsOfJoin(lp, rp,
      attr(lp, leftKey), attr(rp, rightKey),
      attr(lp, leftTime), attr(rp, rightTime)))
  }
}
