package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-operator Catalyst extension: a native AS-OF JOIN.
  *
  * Semantics: for every left row, attach `rightValue` from the LAST right
  * row with the same key and `rightTime <= leftTime` (null when no such
  * row). This is the point-in-time correlation the reference's bookkeeping
  * reads approximate with "latest state per logdate"
  * (`dao/HiveSinkDetailDao.scala:73-98` upserts keep only the newest row —
  * an as-of join degenerated to the final instant), generalized to every
  * event timestamp.
  *
  * This file is the full custom-operator ladder the engine charter
  * prescribes when composition can't express the PHYSICAL plan you want
  * (j8 composes the same semantics from union+window; this node plans it
  * as one co-partitioned merge with no union and no window machinery):
  *  - [[AsOfJoinPlan]]   — the logical node (analyzer-visible),
  *  - [[PushFilterThroughAsOf]] — an optimizer `Rule[LogicalPlan]` that
  *    restores predicate pushdown THROUGH the opaque node (the optimizer
  *    cannot see into custom operators; without this rule a filter above
  *    the join stops dead and every left row pays the merge),
  *  - [[AsOfJoinStrategy]] — the `SparkStrategy` mapping logical→physical,
  *  - [[AsOfJoinExec]]   — the physical operator: declares hash-clustered
  *    distribution + (key, time) ordering for both children, so
  *    `EnsureRequirements` plans ONE co-partitioning exchange per side and
  *    the join itself is a zero-copy per-partition streaming merge with
  *    O(1) carried state — the same shuffle shape as a sort-merge join,
  *    which is the scale-correct form at any data size.
  *
  * Registered via `GraftExtensions` (cluster-wide `spark.sql.extensions`)
  * or `GraftExtensions.register` (live session, through
  * `spark.experimental`).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        rightValue: Expression,
                        outAttr: AttributeReference) extends BinaryNode {
  // outAttr is a constructor param, not derived, so its exprId is stable
  // across tree copies (a fresh exprId per copy would orphan parent refs)
  override def output: Seq[Attribute] = left.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  override lazy val resolved: Boolean = childrenResolved &&
    Seq(leftKey, rightKey, leftTime, rightTime, rightValue).forall(_.resolved)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Predicate pushdown through [[AsOfJoinPlan]]: a filter that only needs
  * left-side columns runs before the join. Injected into the operator-
  * optimization batch, where it cooperates with the builtin pushdown rules
  * to carry the predicate all the way into the scan (fixed-point: this
  * rule moves it past the join, `PushDownPredicates` takes it from there).
  * Left side only — a right-side predicate would change which rows are
  * CANDIDATES for "last at-or-before" and thus the join's result. */
object PushFilterThroughAsOf extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Filter(cond, a: AsOfJoinPlan)
        if cond.deterministic && cond.references.subsetOf(a.left.outputSet) =>
      a.copy(left = Filter(cond, a.left))
  }
}

/** User-facing builder: the library API for the native operator. Columns
  * must be resolved against the passed DataFrames (e.g. `df("col")`); both
  * sides should carry FRESH aliases when they derive from one source, so
  * the binary node's sides stay exprId-unambiguous. */
object AsOfJoin {
  def apply(left: org.apache.spark.sql.DataFrame, right: org.apache.spark.sql.DataFrame,
            leftKey: org.apache.spark.sql.Column, rightKey: org.apache.spark.sql.Column,
            leftTime: org.apache.spark.sql.Column, rightTime: org.apache.spark.sql.Column,
            rightValue: org.apache.spark.sql.Column, as: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.graft.bridge
    val spark = left.sparkSession
    graft.GraftExtensions.register(spark) // idempotent; no-op under spark.sql.extensions
    val value = bridge.expression(rightValue)
    val plan = AsOfJoinPlan(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      bridge.expression(leftKey), bridge.expression(rightKey),
      bridge.expression(leftTime), bridge.expression(rightTime), value,
      AttributeReference(as, value.dataType, nullable = true)())
    bridge.ofRows(spark, plan)
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, rv, out) =>
      AsOfJoinExec(lk, rk, lt, rt, rv, out, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        rightValue: Expression, outAttr: AttributeReference,
                        left: SparkPlan, right: SparkPlan) extends BinaryExecNode {
  override def output: Seq[Attribute] = left.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)

  /** Both children hash-clustered on their key: EnsureRequirements plans
    * compatible exchanges (or none, when an upstream shuffle/bucket
    * already provides the clustering) and zipPartitions sees co-located
    * key ranges. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  /** (key, time) ascending on both sides — the merge's entire contract. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
        Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // carried values may be buffer-backed (UTF8String over a reused page);
  // copy anything that outlives the iterator step that produced it
  private def owned(v: Any): Any = v match {
    case s: UTF8String => s.copy()
    case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
    case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
    case r: InternalRow => r.copy()
    case other => other
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output
    val (lk0, lt0) = (leftKey, leftTime)
    val (rk0, rt0, rv0) = (rightKey, rightTime, rightValue)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = BindReferences.bindReference(lk0, leftOut)
      val lTime = BindReferences.bindReference(lt0, leftOut)
      val rKey = BindReferences.bindReference(rk0, rightOut)
      val rTime = BindReferences.bindReference(rt0, rightOut)
      val rVal = BindReferences.bindReference(rv0, rightOut)
      val proj = UnsafeProjection.create(outAttrs, leftOut :+ outAttr)
      val joined = new JoinedRow
      val valueRow = new GenericInternalRow(1)
      // one-row lookahead extracted to owned values (executor rows are
      // reused buffers; holding the row itself across next() is a bug)
      var rHas = false
      var rHeadKey: Any = null; var rHeadTime: Any = null; var rHeadVal: Any = null
      def advance(): Unit =
        if (rIter.hasNext) {
          val r = rIter.next()
          rHeadKey = owned(rKey.eval(r)); rHeadTime = rTime.eval(r)
          rHeadVal = owned(rVal.eval(r)); rHas = true
        } else rHas = false
      advance()
      // O(1) merge state: the latest right (key, value) at-or-before the
      // current left cursor — the "carry-forward" j8 emulates with
      // last(_, ignoreNulls) over a window, held here as two locals
      var carriedKey: Any = null; var carriedVal: Any = null; var has = false
      lIter.map { l =>
        val lk = lKey.eval(l)
        val lt = lTime.eval(l)
        // consume right rows while: null-keyed (match nothing, skip), or
        // strictly earlier key, or same key with time <= left time
        while (rHas && (rHeadKey == null || (lk != null && {
          val c = keyOrd.compare(rHeadKey, lk)
          c < 0 || (c == 0 && timeOrd.compare(rHeadTime, lt) <= 0)
        }))) {
          if (rHeadKey != null) { carriedKey = rHeadKey; carriedVal = rHeadVal; has = true }
          advance()
        }
        valueRow.update(0,
          if (has && lk != null && keyOrd.compare(carriedKey, lk) == 0) carriedVal
          else null)
        proj(joined(l, valueRow))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
