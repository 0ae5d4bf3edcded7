package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join: for every left row, the latest right row with
  * the same key and `rightTime <= leftTime` (left-outer; ties on equal
  * times resolved by the right-side tie-break columns, largest wins).
  *
  * Batch Spark has no as-of operator; the composable emulation
  * (equi-join on key + time inequality, then `row_number() = 1`,
  * see graft.operators.Relational.joinAsof) materializes every
  * (left, right-at-or-before) pair before discarding all but one — at
  * 100 TB with deep per-key history that intermediate is the dominant
  * cost. This operator is the ladder's rung (c): a custom LogicalPlan
  * + SparkStrategy + SparkPlan that sorts both sides once per shuffle
  * partition and streams them through a single merge pass — no row
  * explosion, state = one retained right row per key.
  *
  * Physical contract: children are hash-clustered on the join keys
  * (EnsureRequirements inserts the co-partitioned exchanges) and
  * sorted by (keys, time[, tie-break]); the merge keeps the last right
  * row whose (key, time) is ≤ the current left row's, which under the
  * ascending sort is exactly the as-of winner.
  *
  * This package sits under org.apache.spark.sql to reach the two
  * `private[sql]` seams every Spark extension of this kind needs:
  * Dataset.ofRows (DataFrame from a custom LogicalPlan) and the
  * classic session internals.
  */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    // pandas merge_asof surface: backward (default) = latest right with
    // rightTime <= leftTime; forward = earliest right with
    // rightTime >= leftTime. tolerance bounds |Δtime| in the time
    // type's native units (µs for timestamps, days for dates); -1 = ∞.
    forward: Boolean = false,
    tolerance: Long = -1L) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: column pruning through [[AsofJoin]]. Catalyst's
  * ColumnPruning only understands built-in nodes, so without this a
  * custom operator silently defeats one of the most valuable scan
  * optimizations — every column of both inputs would be read and
  * shuffled even if the query selects two of them. When a Project
  * above an AsofJoin uses a strict subset of its output, push Projects
  * onto both children keeping only the referenced columns plus the
  * operator's own keys/time/tie-break inputs; the pruned projection
  * then reaches the parquet scan (ReadSchema — asserted in PlanSpec). */
object PruneAsofJoinColumns
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, aj @ AsofJoin(l, r, lk, rk, lt, rt, tb, _, _))
        if (aj.outputSet -- p.references).nonEmpty =>
      val needed = p.references
      val lKeep = l.output.filter(a => needed.contains(a) ||
        (lk :+ lt).exists(_.references.contains(a)))
      val rKeep = r.output.filter(a => needed.contains(a) ||
        (rk ++ (rt +: tb)).exists(_.references.contains(a)))
      if (lKeep.size == l.output.size && rKeep.size == r.output.size) p
      else p.copy(child = aj.copy(
        left = Project(lKeep, l), right = Project(rKeep, r)))
  }
}

/** Planner rule: AsofJoin → AsofJoinExec (injected via
  * [[graft.plans.GraftExtensions]]). */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, tb, fwd, tol) =>
      AsofJoinExec(lk, rk, lt, rt, tb, fwd, tol,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    forward: Boolean,
    tolerance: Long,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: rightTieBreak)).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val keyTypes = leftKeys.map(_.dataType)
    val rWidth = rOut.size

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeEval = BindReferences.bindReference(lTimeExpr, lOut)
      val rTimeEval = BindReferences.bindReference(rTimeExpr, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      // ordering over the declared time type — TimestampType (Long),
      // DateType (Int), numeric: all orderable, no hard Long cast
      val timeOrd = org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(lTimeExpr.dataType)
      val nullRight = new GenericInternalRow(rWidth)
      val joined = new JoinedRow
      // downstream consumers (incl. SparkPlan.getByteArrayRdd at the
      // plan root) require UnsafeRow output
      val toUnsafe = UnsafeProjection.create(
        (lOut.map(_.dataType) ++ rOut.map(_.dataType)).toArray)

      // |Δtime| in native units for the tolerance test: timestamps and
      // dates both evaluate to boxed integral types
      def units(v: Any): Long = v.asInstanceOf[Number].longValue
      val tol = tolerance

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _          // unconsumed right row
        private var lastMatch: InternalRow = _      // copy: best right so far
        private var lastMatchKey: UnsafeRow = _     // copy: its key
        private var lastMatchTime: Any = _          // its time value

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTime = lTimeEval.eval(l)
          // SQL equi-join semantics: a null key matches nothing
          var done = lKey.anyNull
          while (!done) {
            if (rHead == null) {
              if (rIter.hasNext) rHead = rIter.next() else done = true
            }
            if (rHead != null) {
              val rKey = rKeyProj(rHead)
              if (rKey.anyNull) {
                // null-keyed right rows (sorted first) can never match
                rHead = null
              } else {
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) {
                rHead = null // right key is behind every remaining left
              } else if (c > 0) {
                done = true // right key is ahead; retain for later lefts
              } else {
                val rTime = rTimeEval.eval(rHead)
                if (rTime == null) {
                  rHead = null // null time can never be an as-of match
                } else if (forward) {
                  if (lTime == null) {
                    done = true // unmatched; keep rHead for later lefts
                  } else if (timeOrd.compare(rTime, lTime) < 0) {
                    // strictly before this left — and lefts only grow, so
                    // before every remaining left of this key too
                    rHead = null
                  } else {
                    done = true // first at-or-after: the forward winner
                  }
                } else if (lTime != null && timeOrd.compare(rTime, lTime) <= 0) {
                  lastMatch = rHead.copy() // rows are reused buffers
                  lastMatchKey = lKey.copy()
                  lastMatchTime = rTime
                  rHead = null
                } else {
                  done = true // too new for this left row, maybe not the next
                }
              }
              }
            }
          }
          // rightTime <= NULL is never true, so a null left time emits the
          // null-right row even when a previous left row of the same key
          // left a surviving lastMatch (SQL as-of semantics)
          val matched =
            if (forward) {
              lTime != null && !lKey.anyNull && rHead != null && {
                val rk = rKeyProj(rHead)
                !rk.anyNull && keyOrd.compare(rk, lKey) == 0 && {
                  val rt = rTimeEval.eval(rHead)
                  rt != null && timeOrd.compare(rt, lTime) >= 0 &&
                    (tol < 0 || units(rt) - units(lTime) <= tol)
                }
              }
            } else {
              lTime != null && lastMatch != null && lastMatchKey != null &&
                keyOrd.compare(lastMatchKey, lKey) == 0 &&
                (tol < 0 || units(lTime) - units(lastMatchTime) <= tol)
            }
          val r = if (matched) { if (forward) rHead else lastMatch }
                  else nullRight
          toUnsafe(joined(l, r))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Builder: resolves column names against the analyzed child plans and
  * lifts the logical node back into a DataFrame. */
object AsofJoinApi {
  /** `forward = false` (default): latest right row with
    * rightTime <= leftTime. `forward = true`: earliest right row with
    * rightTime >= leftTime (ties → smallest tie-break, mirroring the
    * backward mode's largest-wins under the shared ascending sort).
    * `tolerance` bounds |Δtime| in the time type's native units
    * (µs for timestamps, days for dates); negative = unbounded. */
  def join(
      leftDf: DataFrame, rightDf: DataFrame,
      keys: Seq[(String, String)],
      leftTimeCol: String, rightTimeCol: String,
      rightTieBreakCols: Seq[String],
      forward: Boolean = false,
      tolerance: Long = -1L): DataFrame = {
    val spark = leftDf.sparkSession
    val lp = leftDf.queryExecution.analyzed
    val rp = rightDf.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    val lt = attr(lp, leftTimeCol)
    val rt = attr(rp, rightTimeCol)
    // the merge compares raw time values with one ordering, so the two
    // sides must agree on type — or both be Long-micros timestamps
    // (TimestampType vs TimestampNTZType: identical physical value and
    // ordering; parquet writers routinely mix the two)
    def micros(t: org.apache.spark.sql.types.DataType) =
      t == org.apache.spark.sql.types.TimestampType ||
        t == org.apache.spark.sql.types.TimestampNTZType
    require(lt.dataType == rt.dataType || (micros(lt.dataType) && micros(rt.dataType)),
      s"as-of time columns must share a type: " +
        s"$leftTimeCol is ${lt.dataType}, $rightTimeCol is ${rt.dataType}")
    require(RowOrdering.isOrderable(lt.dataType),
      s"as-of time type ${lt.dataType} is not orderable")
    // the tolerance test subtracts raw time values as longs (units() in
    // doExecute casts to Number), so a bounded join needs an
    // integral-backed time type — any orderable type (e.g. string) is
    // fine only when tolerance is unbounded. Fail at build time, not
    // with a per-row ClassCastException mid-job.
    if (tolerance >= 0L) {
      import org.apache.spark.sql.types._
      val integralBacked = lt.dataType match {
        case TimestampType | TimestampNTZType | DateType => true
        case _: IntegralType => true
        case _ => false
      }
      require(integralBacked,
        s"as-of tolerance requires an integral-backed time type " +
          s"(timestamp, date, or integer), got ${lt.dataType}")
    }
    val node = AsofJoin(lp, rp,
      keys.map(k => attr(lp, k._1)), keys.map(k => attr(rp, k._2)),
      lt, rt, rightTieBreakCols.map(attr(rp, _)), forward, tolerance)
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], node)
  }
}
