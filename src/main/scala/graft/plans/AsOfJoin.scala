package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.SparkStrategy

/** AS-OF JOIN as a first-class operator (logical node + strategy +
  * physical sort-merge plan) — the (c)-tier extension point: Spark has
  * no native as-of join, and composing it from built-ins costs a full
  * window + self-join. Semantics: for every left row, the single
  * right row with the same key and the greatest timestamp
  * `right.ts <= left.ts` (inner: unmatched left rows drop) — joining
  * events to the state that was current when each event happened,
  * the canonical event-time enrichment of a training-data pipeline.
  *
  * Scale shape: identical to a SortMergeJoin — both sides hash-shuffle
  * on the key (`ClusteredDistribution`) and sort by (key, ts)
  * (`requiredChildOrdering`); each partition then streams BOTH sides
  * once with O(1) state (the last-seen right row). No window, no
  * buffering of whole key groups, no data ever crosses partitions
  * twice. Keys/timestamps must evaluate to Long (ids / internal
  * timestamp micros) — pack composite keys into one long or hash them.
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression)
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val schema = output
    val leftOut = left.output
    val rightOut = right.output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(schema, leftOut ++ rightOut)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // O(1) per-partition state: the best (latest ts <= left.ts)
      // right row seen for the key currently being merged.
      var rLast: InternalRow = null
      var rLastKey = 0L

      lIter.flatMap { l =>
        // SQL join semantics: a null key or timestamp never matches —
        // drop null-keyed left rows, never retain null-keyed right rows
        // (an unguarded asInstanceOf[Long] would unbox null to 0L and
        // silently merge them into the key-0 group).
        val lkAny = lKeyB.eval(l)
        val ltAny = lTsB.eval(l)
        if (lkAny == null || ltAny == null) None
        else {
          val lk = lkAny.asInstanceOf[Long]
          val lt = ltAny.asInstanceOf[Long]
          if (rLast != null && rLastKey != lk) rLast = null
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rkAny = rKeyB.eval(rBuf.head)
            val rtAny = rTsB.eval(rBuf.head)
            if (rkAny == null || rtAny == null) { rBuf.next() }
            else {
              val rk = rkAny.asInstanceOf[Long]
              val rt = rtAny.asInstanceOf[Long]
              if (rk < lk || (rk == lk && rt <= lt)) {
                if (rk == lk) { rLast = rBuf.head.copy(); rLastKey = rk }
                rBuf.next()
              } else advancing = false
            }
          }
          if (rLast != null && rLastKey == lk) Some(proj(joined(l, rLast)))
          else None
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Plans the logical AsOfJoin into its exec; injected via
  * [[GraftExtensions]] or `spark.experimental.extraStrategies`. */
object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}
