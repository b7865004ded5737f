package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Dsl._
import graft.tables.Tables

/** Market-basket co-occurrence analytics — the affinity mining a
  * commerce/event platform runs over its order stream ("customers who
  * bought X also bought Y"), and the association-rule statistics
  * (support, confidence, lift) every recommendation baseline starts
  * from (Agrawal/Srikant's apriori frame, reduced to pairs). The
  * reference's per-order consumer (consumer/consumer.go:95) reads line
  * items one at a time and can relate nothing across a basket.
  */
object Basket {

  /** q160: brand co-occurrence over order baskets — for every unordered
    * brand pair (a < b), the number of orders containing BOTH brands,
    * each brand's own order count, the rule confidence P(b | a) and the
    * lift P(a ∧ b) / (P(a)·P(b)). Lift > 1 is genuine affinity, < 1
    * substitution — the statistic a recommender thresholds.
    *
    * Determinism: all counts are exact integers; confidence is ratio4
    * (operands ≤ order count, inside its 2⁵³/20000 window at any shipped
    * scale) and lift is ratio4dec (its operands are COUNT PRODUCTS —
    * n_ab·N and n_a·n_b pass 2⁵³ at ~3·10⁹ orders, so the decimal
    * carrier is what survives a 100 TB order log).
    *
    * Scale posture: the fact-dim join (lineitem → part on p_partkey)
    * reduces each line to its brand, then ONE distinct shuffle builds
    * the (order, brand) membership; the pair self-join is an EQUI-join
    * on o_orderkey whose fan-out is bounded by (distinct brands per
    * order)² — basket-bounded, never corpus². The pair aggregate
    * map-side-combines to ≤ |brands|² partials per task, and the
    * per-brand totals and the single-row order count broadcast back
    * (NoCartesian-allowlisted). Output ≤ |brands|² rows. */
  def q160(spark: SparkSession, sfDir: String): DataFrame =
    basketPairs(
      Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_partkey")),
      Tables.part(spark, sfDir).select(col("p_partkey"), col("p_brand")))

  /** q160 kernel on (l_orderkey, l_partkey) × (p_partkey, p_brand)
    * frames (planted-data seam). */
  private[graft] def basketPairs(li: DataFrame, brands: DataFrame): DataFrame = {
    // one membership build feeds the order total, the per-brand totals
    // and BOTH sides of the pair join (q104 pinning discipline)
    val ob = pin(li.join(brands, col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("okey"), col("p_brand").as("brand"))
      .distinct())
    val tot = ob.agg(count_distinct(col("okey")).as("n_orders"))
    val per = ob.groupBy(col("brand")).agg(count(lit(1)).as("n_single"))
    val pairs = ob.join(
        ob.select(col("okey"), col("brand").as("brand_b")), Seq("okey"))
      .filter(col("brand") < col("brand_b"))
      .groupBy(col("brand").as("brand_a"), col("brand_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(per.select(col("brand").as("brand_a"), col("n_single").as("n_a"))),
        Seq("brand_a"))
      .join(broadcast(per.select(col("brand").as("brand_b"), col("n_single").as("n_b"))),
        Seq("brand_b"))
      .join(broadcast(tot))
      .select(col("brand_a"), col("brand_b"), col("n_ab"), col("n_a"), col("n_b"),
        ratio4(col("n_ab"), col("n_a")).as("conf4"),
        ratio4dec(col("n_ab").cast("decimal(38,0)") * col("n_orders").cast("decimal(38,0)"),
          col("n_a").cast("decimal(38,0)") * col("n_b").cast("decimal(38,0)")).as("lift4"))
      .orderBy(col("brand_a"), col("brand_b"))
  }
}
