package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join: for each left row, the LATEST right row of the same
  * key with `rightTime <= leftTime` (left-outer: unmatched rows pad nulls).
  *
  * This is the tier-(c) custom operator of the preference ladder — a whole
  * relational operator Spark's built-ins don't provide (reference semantics:
  * "most recent prior observation", the kdb/Flink temporal-join shape;
  * composition via conditional running max works when the payload is one
  * column, q53, but a general multi-column payload needs either an
  * argmax-struct trick per column or this operator):
  *
  *   logical [[AsOfJoinPlan]]  →  [[GraftStrategy]]  →  [[AsOfJoinExec]]
  *
  * The physical operator declares ClusteredDistribution on each side's key
  * and per-partition (key, time) ordering, so EnsureRequirements inserts
  * exactly the exchanges/sorts a SortMergeJoin would get — then a single
  * forward merge pass joins each partition with O(1) state (one buffered
  * right row), no per-key window materialization. At 100 TB this shuffles
  * each side once and streams; the window-composition form must shuffle the
  * UNION of both tables into one partitioning and sort them together.
  *
  * Keys and times are LongType in this implementation (documented contract;
  * generalizing to any ordered type means swapping the two getLong calls
  * for a TypeUtils ordering).
  */
final case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

final case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // same contract SortMergeJoinExec declares: cluster each side by its key
  // (EnsureRequirements co-partitions them) and sort within partitions
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = Seq(leftKey, leftTime)
    val rKeyExprs = Seq(rightKey, rightTime)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lkGen = UnsafeProjection.create(lKeyExprs, lOut)
      val rkGen = UnsafeProjection.create(rKeyExprs, rOut)
      // bind the output against a right schema FORCED nullable: the
      // null-padding row must be read as nulls even when the child's
      // attributes claim non-null (else the projection skips the null
      // check and emits zeros)
      val outGen = UnsafeProjection.create(output,
        lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val rNulls = new GenericInternalRow(rOut.size)
      var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
      // one buffered candidate: the latest right row consumed for matchKey
      var matched: InternalRow = null
      var matchKey = 0L
      lIter.map { lRow =>
        val lkt = lkGen(lRow)
        // SQL equi-join semantics: a null key (or time) matches nothing —
        // pad and move on. Null-keyed rows sort NULLS FIRST, so they are
        // consumed before any non-null work begins.
        if (lkt.isNullAt(0) || lkt.isNullAt(1)) {
          outGen(joined(lRow, rNulls))
        } else {
          val lk = lkt.getLong(0)
          val lt = lkt.getLong(1)
          var scan = rRow != null
          while (scan) {
            val rkt = rkGen(rRow)
            if (rkt.isNullAt(0) || rkt.isNullAt(1)) {
              // null-keyed right rows can never match — drop
              rRow = if (rIter.hasNext) rIter.next() else null
            } else {
              val rk = rkt.getLong(0)
              if (rk < lk) {
                // left keys only grow within the partition: rows of earlier
                // keys can never match again — drop without buffering
                rRow = if (rIter.hasNext) rIter.next() else null
              } else if (rk == lk && rkt.getLong(1) <= lt) {
                matched = rRow.copy() // right times ascend: later consume wins
                matchKey = rk
                rRow = if (rIter.hasNext) rIter.next() else null
              } else scan = false
            }
            if (rRow == null) scan = false
          }
          val rSide = if (matched != null && matchKey == lk) matched else rNulls
          outGen(joined(lRow, rSide))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy for graft's custom logical operators. */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

object AsOfJoin {

  /** Register the strategy on this session (idempotent). `experimental
    * .extraStrategies` is the per-session registration point; a session
    * built from config would use SparkSessionExtensions.injectPlannerStrategy.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(GraftStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftStrategy

  /** As-of left join `left` to `right` on `left.key == right.key` and the
    * latest `right.time <= left.time`. Column names must be disjoint apart
    * from nothing — rename the right side before calling. Key/time columns
    * must be LongType.
    */
  def asof(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    // Splicing two analyzed plans bypasses the analyzer's duplicate-attribute
    // resolution: shared exprIds (both sides derived from the same source)
    // would silently bind the wrong columns. Enforce the documented contract.
    val shared = lp.outputSet.intersect(rp.outputSet)
    if (shared.nonEmpty)
      throw new IllegalArgumentException(
        "asof(): left and right share attributes " +
          shared.map(_.name).mkString("[", ", ", "]") +
          " — re-alias the right side (e.g. select(cols.map(c => col(c).as(c + \"_r\")))) " +
          "so its exprIds are fresh before joining")
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not in ${p.output.map(_.name)}"))
    ofRows(spark, AsOfJoinPlan(lp, rp, attr(lp, leftKey), attr(rp, rightKey),
      attr(lp, leftTime), attr(rp, rightTime)))
  }

  // Dataset.ofRows — public API through Spark 3, private[sql] since the 4.x
  // classic/connect split; routed through the repo's one private-API seam.
  private def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): DataFrame = graft.SparkShims.ofRows(spark, plan)
}
