package graft.ops

import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.functions.col

import graft.plans.{AsOfJoinPlan, AsOfJoinStrategy, PushFilterThroughAsOfJoin}

/** Public face of the native as-of join (graft.plans.AsOfJoin): for every
  * left row, attach payload columns of the LAST right row with an equal
  * key and right time ≤/< left time. The window-composition twin
  * (graft.queries.Events.asOf) stays as the executable specification —
  * SemanticsSpec proves the two row-equal on the event log and on planted
  * edge cases, the same native-equals-spec discipline as the custom
  * expressions.
  */
object AsOf {

  /** Idempotently register the planner strategy on an already-built
    * session (the `spark.sql.extensions=graft.GraftExtensions` config
    * route covers sessions built with it; this covers the rest). */
  def install(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
    if (!exp.extraOptimizations.contains(PushFilterThroughAsOfJoin))
      exp.extraOptimizations = exp.extraOptimizations :+ PushFilterThroughAsOfJoin
  }

  /** As-of join `left` with `right`.
    *
    * @param key      equi-join key column name (same name both sides)
    * @param leftTime left-side event-time column name
    * @param rightTime right-side event-time column name
    * @param payload  right columns to attach, as (rightName, outputName)
    * @param inclusive true: match rightTime ≤ leftTime; false: strict <
    *
    * The right side is re-aliased behind fresh expression ids before the
    * node is built, so self-as-of-joins (both sides carved from the same
    * table — the q09 shape) never carry ambiguous attributes into the
    * custom node.
    *
    * Tie caveat (shared with the window-composition spec's `last()`): if
    * several right rows carry the SAME (key, time), whichever sorts last
    * wins — deterministic only when the payload is a function of
    * (key, time), e.g. the time itself (q09). Callers needing a total
    * order should pre-aggregate the right side to one row per (key, time).
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[(String, String)],
      inclusive: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    // One projection under the node does BOTH hygiene jobs: fresh exprIds
    // on the whole right side (self-join safety — both q09 sides are
    // carved from the same table) and the payload's OUTPUT names. The
    // renames must live in this projection, not as Aliases inside the
    // node: the analyzer's CleanupAliases strips Aliases from every
    // non-whitelisted operator's expressions.
    val kCol = "__asof_key"
    val tCol = "__asof_time"
    val rightFresh = right.select(
      (Seq(col(key).as(kCol), col(rightTime).as(tCol)) ++
        payload.map { case (src, out) => col(src).as(out) }): _*)
    val lPlan = GraftColumnBridge.analyzed(left)
    val rPlan = GraftColumnBridge.analyzed(rightFresh)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    GraftColumnBridge.ofRows(spark,
      AsOfJoinPlan(lPlan, rPlan,
        attr(lPlan, key), attr(rPlan, kCol),
        attr(lPlan, leftTime), attr(rPlan, tCol),
        payload.map { case (_, out) => attr(rPlan, out) }, inclusive))
  }
}
