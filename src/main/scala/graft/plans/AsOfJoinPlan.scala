package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Native as-of join — the full custom-operator ladder (SURVEY §2.H1 /
  * §7b): LogicalPlan node + planner Strategy + physical exec.
  *
  * Semantics (identical to operators.AsOf.asOfJoin, asserted against
  * the same DuckDB oracle): for each left row, attach the LATEST right
  * row with `right.ts <= left.ts` within the same key; right columns
  * are null when no such row exists.
  *
  * Physical shape: both children hash-clustered on the key (pinned to
  * the same partition count so the sides stay zip-able under AQE) and
  * sorted by (key, ts); the exec then does ONE streaming merge pass per
  * partition with O(1) state — no window buffer, no unioned schema, no
  * per-key materialization. This is what the declarative union+window
  * formulation approximates; the native exec eliminates its union,
  * null-payload columns, and window-frame machinery.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTs: Expression, rightTs: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // pin the partition count: both sides must land in the SAME number of
  // partitions or the per-partition zip is wrong; the explicit count
  // also stops AQE from coalescing one side independently
  override def requiredChildDistribution: Seq[Distribution] = {
    val n = Some(conf.numShufflePartitions)
    ClusteredDistribution(Seq(leftKey), requiredNumPartitions = n) ::
      ClusteredDistribution(Seq(rightKey), requiredNumPartitions = n) :: Nil
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)) ::
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) :: Nil

  override def outputPartitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val nRight = right.output.size
    val leftOut = left.output
    val rightOut = right.output
    val lk = BindReferences.bindReference(leftKey, leftOut)
    val lt = BindReferences.bindReference(leftTs, leftOut)
    val rk = BindReferences.bindReference(rightKey, rightOut)
    val rt = BindReferences.bindReference(rightTs, rightOut)
    val allOut = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val rBuf = rIt.buffered
      val joined = new JoinedRow
      val nullRight = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(nRight)
      val resultProj = UnsafeProjection.create(allOut, allOut)
      var lastMatch: InternalRow = null
      var lastMatchKey: Any = null

      lIt.map { lRow =>
        val k = lk.eval(lRow)
        val ts = lt.eval(lRow)
        if (k == null || ts == null) {
          // null key/ts never matches (SQL null-join semantics)
          resultProj(joined(lRow, nullRight))
        } else {
        // advance the right side past everything at-or-before (k, ts)
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val head = rBuf.head
          val hk = rk.eval(head)
          if (hk == null) { rBuf.next() } // null right key never matches
          else {
            val c = keyOrd.compare(hk, k)
            val hts = if (c == 0) rt.eval(head) else null
            if (c < 0 || (c == 0 && hts != null && tsOrd.compare(hts, ts) <= 0)) {
              val r = rBuf.next()
              if (c == 0) {
                lastMatch = r.copy()
                lastMatchKey = InternalRow.copyValue(hk)
              }
            } else if (c == 0 && hts == null) rBuf.next() // null ts: skip
            else advancing = false
          }
        }
        val matched = lastMatch != null && lastMatchKey != null &&
          keyOrd.compare(lastMatchKey, k) == 0
        resultProj(joined(lRow, if (matched) lastMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API for the native as-of join. The planner strategy
  * must be installed (GraftExtensions at build time, or
  * [[AsOfNative.install]] on a live session).
  */
object AsOfNative {
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  def asOfJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        sys.error(s"column $n not in ${p.output.map(_.name)}"))
    GraftBridge.ofRows(spark, AsOfJoinNode(lp, rp,
      attr(lp, leftKey), attr(rp, rightKey),
      attr(lp, leftTs), attr(rp, rightTs)))
  }
}
