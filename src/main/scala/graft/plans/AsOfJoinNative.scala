package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join as a first-class Catalyst citizen: a custom
  * logical node, a planner [[SparkStrategy]], and a physical
  * [[AsOfJoinExec]] — the (c)-tier extension path for semantics the
  * built-in operators can't express as ONE operator (SURVEY §7.3). The
  * composable union+window formulation (PipelineQueries.qAsofJoin) stays
  * the default; this node exists to demonstrate — and gate — the native
  * route a dedicated engine takes: EnsureRequirements co-partitions both
  * sides on the key and sorts them by (key, time), and the exec does a
  * single streaming merge per partition with O(1) carried state (the
  * latest right row), never buffering a window frame.
  *
  * Semantics: LEFT OUTER as-of — every left row pairs with the latest
  * right row of the same key whose time is <= the left row's time
  * (inclusive), or nulls if none. Keys and times must be non-null
  * BIGINTs (the caller casts; the gated query uses user ids and epoch
  * millis).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute)
    extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // same contract as SortMergeJoin: cluster both sides on their key
  // (EnsureRequirements inserts co-partitioned exchanges) and have each
  // partition arrive sorted by (key, time) — the merge below then needs
  // exactly one pass and one buffered row
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lkIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val ltIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rkIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rtIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    val rightWidth = right.output.size
    val schema = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val project = UnsafeProjection.create(schema, schema)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      // one buffered candidate (the next unconsumed right row) plus the
      // latest match per key — O(1) state however large the partition
      var pending: InternalRow = null
      var lastMatch: InternalRow = null
      var lastMatchKey = 0L
      lIter.map { lRow =>
        val k = lRow.getLong(lkIdx)
        val t = lRow.getLong(ltIdx)
        var advancing = true
        while (advancing) {
          if (pending == null && rIter.hasNext) pending = rIter.next().copy()
          if (pending == null) advancing = false
          else {
            val rk = pending.getLong(rkIdx)
            val rt = pending.getLong(rtIdx)
            if (rk < k || (rk == k && rt <= t)) {
              lastMatch = pending
              lastMatchKey = rk
              pending = null
            } else advancing = false
          }
        }
        val r =
          if (lastMatch != null && lastMatchKey == k) lastMatch else nullRight
        project(joined(lRow, r))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinNative {

  /** LEFT OUTER as-of join of `left` to the latest `right` row per key
    * with rightTime <= leftTime. Registers the planner strategy on the
    * session idempotently (also injectable via GraftExtensions for
    * conf-only deployments). Give the two sides disjoint column names —
    * the node does no deduplication.
    */
  def asof(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    // scan the FULL planner strategy list (extension-injected included),
    // not just experimental.extraStrategies — a session built with
    // GraftExtensions already carries the strategy via
    // injectPlannerStrategy and must not plan every query twice
    if (!org.apache.spark.sql.graftshim.Shims.plannerStrategies(spark)
        .exists(_.isInstanceOf[AsOfJoinStrategy]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ new AsOfJoinStrategy
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output.map(_.name)}"))
    org.apache.spark.sql.graftshim.Shims.ofRows(spark,
      AsOfJoinPlan(lp, rp, attr(lp, leftKey), attr(rp, rightKey),
        attr(lp, leftTime), attr(rp, rightTime)))
  }
}
