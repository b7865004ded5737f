package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Skyline (Pareto-frontier) query — "the maximal vectors problem"
  * (Börzsönyi/Kossmann/Stocker, ICDE'01): the rows no other row beats on
  * EVERY dimension at once, the multi-criteria shortlist ("cheapest for
  * its size class") a single ORDER BY cannot express. The reference has
  * no multi-criteria read at all (four point lookups).
  */
object Skyline {

  /** q163: the lineitem price/quantity skyline — all (quantity,
    * extendedprice) points not STRICTLY dominated under (maximize
    * l_quantity, minimize l_extendedprice): p dominates q iff it is ≥ on
    * quantity, ≤ on price, and strictly better on at least one. Output:
    * each frontier point with the number of lineitems sitting exactly on
    * it.
    *
    * The scalable form is DIMENSION-DOMAIN REDUCTION, not a pairwise
    * dominance join: (1) only the min-price point at each quantity level
    * can survive (any other point at the same quantity is dominated by
    * it), so one map-side-combined aggregate collapses the corpus to
    * ≤ |quantity domain| candidates — l_quantity is a 1..50 integer
    * grid, so the candidate frame is ≤ 50 rows AT ANY CORPUS SIZE; (2)
    * among candidates (all quantities distinct), a point survives iff
    * its price is strictly below every HIGHER-quantity candidate's
    * price — one running-min window over the 50-row frame, scanning
    * quantity descending (the classic sort-filter skyline, legal here
    * because the frame is domain-bounded; bounded-global-window
    * allowlisted). The pairwise NOT EXISTS the oracle could have used is
    * the quadratic plan this operator exists to avoid — the oracle
    * instead mirrors the same reduction, which is provably equal to it.
    *
    * Determinism: all comparisons exact (prices compared, never
    * arithmetic); counts exact integers. */
  def q163(spark: SparkSession, sfDir: String): DataFrame =
    skyline(Tables.lineitem(spark, sfDir)
      .select(col("l_quantity").as("qty"), col("l_extendedprice").as("price")))

  /** q163 kernel on a (qty, price) frame (planted-data seam). */
  private[graft] def skyline(rows: DataFrame): DataFrame =
    // per-(qty, price) counts first (one map-side-combined shuffle; the
    // 1..50 × 2-dec-price grid bounds it) — the additive half the s41
    // streaming maintainer accumulates per batch
    frontierOfCounts(rows.groupBy(col("qty"), col("price")).agg(count(lit(1)).as("n")))

  /** Frontier finisher on a per-(qty, price) COUNT frame — the seam s41
    * reads through (its store holds exactly these counts additively), so
    * stream and batch share one dominance definition by construction. */
  private[graft] def frontierOfCounts(g: DataFrame): DataFrame = {
    // per-qty argmin via min-over-struct — (qty, price) is unique in g,
    // so the struct's n field never decides a comparison
    val best = g.groupBy(col("qty"))
      .agg(min(struct(col("price"), col("n"))).as("b"))
      .select(col("qty"), col("b.price").as("best_price"), col("b.n").as("n_best"))
    val w = Window.orderBy(col("qty").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    best
      .withColumn("runmin", min(col("best_price")).over(w))
      .filter(col("runmin").isNull || col("best_price") < col("runmin"))
      .select(col("qty"), col("best_price"), col("n_best"))
      .orderBy(col("qty"))
  }
}
