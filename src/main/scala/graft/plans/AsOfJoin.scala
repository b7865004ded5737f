package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** As-of join as a first-class operator: custom LogicalPlan → SparkStrategy
  * → SparkPlan, registered per session (graft.ops.AsOf) or via
  * GraftExtensions — the whole-operator extension point (SURVEY.md §7.3
  * class (c)) next to the scalar expressions and the Generator.
  *
  * Semantics (the reference's click-attribution shape, consumer-side event
  * correlation): for every LEFT row, attach the payload of the LAST right
  * row with an EQUAL key and rightTime before (strict) or at (inclusive)
  * leftTime; no match → null payload. NULL keys and NULL times never match
  * — SQL equality, pinned against the window-composition twin
  * (Events.asOf) in SemanticsSpec.
  *
  * Why a physical operator when q09's window composition answers the same
  * question: the composition UNIONS both streams and windows over the
  * merged row set, so every right row flows through the window buffer of
  * every frame and the ROWS frame materializes (right ∪ left) per key in
  * one task's sort run. This exec keeps the sides separate — each shuffles
  * ONCE on its own key column, sorts (key, time) within partitions, and a
  * single forward merge sweep joins them with O(1) state (one buffered
  * right row + one remembered match): the textbook MERGE JOIN specialized
  * to "last match wins", streaming-friendly at any key cardinality and
  * shuffle-minimal at 100 TB. PlanSpec pins the exec + its two
  * sort-on-(key, time) children.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightPayload: Seq[Attribute],
    inclusive: Boolean)
  extends BinaryNode {

  // rightPayload carries plain Attributes (already renamed by the builder's
  // projection under the node), NOT Aliases: the analyzer's CleanupAliases
  // strips Alias nodes from the expressions of every non-whitelisted
  // operator, so an Alias here would silently lose its output name.
  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Filter pushdown through the custom node — the injected-optimizer-rule
  * extension seam (`SparkSessionExtensions.injectOptimizerRule` /
  * `spark.experimental.extraOptimizations`): Catalyst's own
  * PushDownPredicates leaves unknown operators alone, so without this a
  * `WHERE` over an as-of join re-reads and shuffles the whole left side
  * before filtering. Deterministic conjuncts that reference only LEFT
  * columns move below the join — sound because left rows pass through
  * 1:1 and each row's match depends only on itself — where the stock
  * rules then carry them down to the scan (`PushedFilters`,
  * PlanSpec-pinned). Right-side or mixed conjuncts stay above (a filter
  * on the matched payload must see the join's nulls). */
object PushFilterThroughAsOfJoin
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{And, PredicateHelper}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  private object Split extends PredicateHelper {
    def conjuncts(e: Expression): Seq[Expression] = splitConjunctivePredicates(e)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, aj: AsOfJoinPlan) =>
      val (pushable, keep) = Split.conjuncts(cond).partition(c =>
        c.deterministic && c.references.subsetOf(aj.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(pushable.reduce(And), aj.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Plans AsOfJoinPlan as AsOfJoinExec; a planner strategy is the sanctioned
  * seam for whole-operator extensions (injected via
  * `SparkSessionExtensions.injectPlannerStrategy` or
  * `spark.experimental.extraStrategies`). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, payload, incl) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, payload, incl) :: Nil
    case _ => Nil
  }
}

/** The merge-sweep physical operator. Declares ClusteredDistribution on
  * each side's key (EnsureRequirements co-partitions the two shuffles,
  * exactly as for sort-merge join) and (key, time) ascending child
  * orderings (EnsureRequirements inserts the sorts), then zips partitions:
  * right rows are consumed monotonically; the last usable one per key is
  * remembered (a single row copy — the operator's entire state). Left
  * rows stream through untouched, so output preserves the left sort order
  * (declared via outputOrdering — downstream per-key windows plan with no
  * re-sort). Row-at-a-time eval (no codegen) — the merge is one comparison
  * chain per row; the shuffle/sort dominates at any scale.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightPayload: Seq[Attribute],
    inclusive: Boolean)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val incl = inclusive
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = BindReferences.bindReference(leftKey, left.output)
      val lTs = BindReferences.bindReference(leftTime, left.output)
      val rKey = BindReferences.bindReference(rightKey, right.output)
      val rTs = BindReferences.bindReference(rightTime, right.output)
      val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      val tsOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
      // The RIGHT side MUST bind as nullable here even when the right
      // child's column is non-nullable: the no-match path projects the
      // all-null nullRight row, and a nullable=false BoundReference skips
      // its null check and reads garbage zeros instead of null.
      // BindReferences takes nullability from the INPUT schema entry, so
      // the override goes on the input side.
      val outProj = UnsafeProjection.create(
        left.output ++ rightPayload.map(_.withNullability(true)),
        left.output ++ right.output.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(right.output.size)

      var head: InternalRow = if (rIter.hasNext) rIter.next() else null
      var matchRow: InternalRow = null // copy of the last usable right row
      var matchKey: Any = null

      lIter.map { l =>
        val lk = lKey.eval(l)
        val lt = lTs.eval(l)
        if (lk == null || lt == null) {
          joined(l, nullRight)
        } else {
          // consume right rows while they are usable for this left row:
          // smaller key (stale), null key/time (never match, sorted
          // first), or same key with time within the bound
          var continue = head != null
          while (continue) {
            val rk = rKey.eval(head)
            if (rk == null) {
              head = if (rIter.hasNext) rIter.next() else null
              continue = head != null
            } else {
              val kc = keyOrd.compare(rk, lk)
              if (kc < 0) {
                head = if (rIter.hasNext) rIter.next() else null
                continue = head != null
              } else if (kc == 0) {
                val rt = rTs.eval(head)
                val usable = rt != null && {
                  val tc = tsOrd.compare(rt, lt)
                  tc < 0 || (incl && tc == 0)
                }
                if (usable || rt == null) {
                  if (usable) { matchRow = head.copy(); matchKey = rk }
                  head = if (rIter.hasNext) rIter.next() else null
                  continue = head != null
                } else {
                  continue = false // right is ahead in time for this key
                }
              } else {
                continue = false // right is ahead in key
              }
            }
          }
          val hit = matchRow != null && matchKey != null &&
            keyOrd.compare(matchKey, lk) == 0
          joined(l, if (hit) matchRow else nullRight)
        }
        outProj(joined)
      }
    }
  }
}
