package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Dsl._
import graft.tables.Tables

/** Aggregation surface (SURVEY.md §2.2 q02, q10, q11, q28, q32).
  *
  * All aggregates run as partial (map-side) + final HashAggregate pairs —
  * the summed measures travel pre-combined through the shuffle, so network
  * volume is O(groups), not O(rows), at any scale.
  */
object Aggregates {

  /** q02: TPC-H Q1-shaped pricing summary — multi-aggregate over two group
    * keys. Sums are exact DECIMAL; averages are exact-sum / count.
    *
    * disc_price/charge are computed in DECIMAL end to end: the raw columns
    * are 2-decimal quantized so their casts are exact, and decimal × decimal
    * stays exact (scale 6 ≪ precision cap) — whereas casting the *double*
    * product would hit .xxxx5 ties that Spark rounds HALF_UP and DuckDB
    * HALF_EVEN (observed divergence, see tools/check.py history). */
  def q02(spark: SparkSession, sfDir: String): DataFrame = {
    val one    = lit(1).cast("decimal(3,2)")
    val priceD = col("l_extendedprice").cast("decimal(12,2)")
    val disc   = priceD * (one - col("l_discount").cast("decimal(4,2)"))
    val charge = disc * (one + col("l_tax").cast("decimal(4,2)"))
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(disc).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** q10: exact distinct aggregate — Spark expands this into a two-phase
    * plan (dedup on (type,user), then count) automatically. */
  def q10(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))

  /** q53: approximate-NDV audit — HyperLogLog++ (approx_count_distinct)
    * next to the exact distinct of q10, with the relative error surfaced.
    * This is the 100 TB form of q10: the sketch is one pass, mergeable,
    * and O(1) state per group, where exact distinct shuffles every
    * (type, user) pair. No DuckDB oracle (HLL register contents are
    * engine-specific — SURVEY.md §2.2 exemption); the driver records a
    * rows-only check and LlmOpsSpec asserts the error bound (rsd 5%,
    * asserted within 3σ) against q10's exact answer. */
  def q53(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.05).as("ndv_approx"),
        countDistinct(col("user_id")).as("ndv_exact"))
      .withColumn("rel_err",
        abs(col("ndv_approx") - col("ndv_exact")).cast("double") / col("ndv_exact"))
      .orderBy(col("event_type"))

  /** q11: ROLLUP with explicit GROUPING flags so subtotal NULLs can't be
    * confused with real NULL keys (determinism rule, SURVEY.md §5.3). */
  def q11(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"),
        count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .select(col("g_flag"), col("g_status"),
        col("l_returnflag"), col("l_linestatus"), col("n"), col("sum_qty"))
      .orderBy(col("g_flag"), col("g_status"), col("l_returnflag"), col("l_linestatus"))

  /** q110: explicit GROUPING SETS — the third member of the
    * multi-granularity family (q11 ROLLUP is the prefix chain, q49 CUBE
    * the power set): ARBITRARY set selection, here the two single-column
    * marginals plus the grand total WITHOUT the (flag, status) cross
    * cells — the report shape where the cross table is noise but both
    * marginals and the total must come from one scan. Same determinism
    * discipline as q11 (grouping() flags as sort keys, decimal-exact
    * sum).
    *
    * Scale posture: one pass, one shuffle — Catalyst expands the sets
    * into an Expand (3 rows per input row here) feeding ONE partial+final
    * hash aggregate; three separate GROUP BYs would scan three times. */
  def q110(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"),
        count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .select(col("g_flag"), col("g_status"),
        col("l_returnflag"), col("l_linestatus"), col("n"), col("sum_qty"))
      .orderBy(col("g_flag"), col("g_status"), col("l_returnflag"), col("l_linestatus"))

  /** q28: event-log audit — events per type per day (the `events` table
    * scan of readme:65-70 generalized to a grouped audit). */
  def q28(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy(col("day"), col("event_type"))

  /** q32: per-language document stats — non-ASCII-safe grouping surface
    * (utf8mb4 requirement, readme:79-81). */
  def q32(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"))
      .orderBy(col("lang"))

  /** The five event types the testdata producer emits — pinned explicitly
    * so the pivot schema is static (a dynamic pivot would scan once to
    * discover values; at 100 TB the value set must be declared). */
  val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** q44: pivot — events per user spread across one count column per
    * event_type (the read-model shape a per-user activity dashboard
    * queries). Static pivot values keep it one pass. */
  def q44(spark: SparkSession, sfDir: String): DataFrame = {
    val p = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
    // pivot+count yields NULL for absent combinations; the dashboard (and
    // DuckDB's COUNT(*) FILTER) wants 0
    p.select(col("user_id") +: EventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy(col("user_id"))
  }

  /** q45: exact percentiles (linear interpolation) of l_quantity per
    * return flag — both engines interpolate identically on DOUBLE input;
    * ROUND(…,4) absorbs last-ulp noise (inputs are 2-decimal quantized so
    * the true quantiles sit on the 4-decimal grid, far from any rounding
    * boundary). */
  def q45(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(expr("percentile(CAST(l_quantity AS DOUBLE), 0.25)"), 4).as("p25"),
        round(expr("percentile(CAST(l_quantity AS DOUBLE), 0.5)"), 4).as("p50"),
        round(expr("percentile(CAST(l_quantity AS DOUBLE), 0.75)"), 4).as("p75"),
        round(expr("percentile(CAST(l_quantity AS DOUBLE), 0.9)"), 4).as("p90"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
      .orderBy(col("l_returnflag"))

  /** q47: skew-safe two-phase (salted) aggregation — the pattern for a
    * hot grouping key at 100 TB: phase 1 aggregates on (key, salt) so a
    * skewed key's rows spread over Salts reducers; phase 2 re-combines the
    * partials. Result provably equals the direct groupBy (sums/counts are
    * associative), which is exactly what the oracle runs. */
  val Salts = 8

  def q47(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("salt", pmod(col("event_id"), lit(Salts.toLong)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("value").cast("decimal(18,4)")).as("psum"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"), sum(col("psum")).cast("double").as("sum_value"))
      .orderBy(col("event_type"))

  /** q48: unpivot/melt — the wide per-user activity row (q44) folded back
    * to long form with Dataset.unpivot. unpivot ∘ pivot (minus the
    * zero-fill) is the identity on the grouped counts, which is exactly
    * the shape the oracle computes directly. */
  def q48(spark: SparkSession, sfDir: String): DataFrame =
    q44(spark, sfDir)
      .unpivot(Array(col("user_id")), EventTypes.map(col).toArray, "event_type", "n")
      .filter(col("n") > 0)
      .orderBy(col("user_id"), col("event_type"))

  /** q68: approximate percentiles — the sketch form of q45 exactly as q53
    * is the sketch form of q10: `approx_percentile` builds a mergeable
    * quantile sketch (one pass, bounded state per group, partials combine
    * map-side), which is the only percentile that works at 100 TB — the
    * exact interpolation needs the sorted column. Surfaced next to the
    * exact values with the relative error, so the operator audits itself.
    * No oracle (sketch internals are engine-specific; SURVEY §2.2
    * exemption — driver records rows-only); LlmOpsSpec asserts the error
    * bound against q45's exact answers. */
  def q68(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(expr("approx_percentile(CAST(l_quantity AS DOUBLE), 0.5, 1000)"), 4).as("p50_approx"),
        round(expr("percentile(CAST(l_quantity AS DOUBLE), 0.5)"), 4).as("p50_exact"),
        round(expr("approx_percentile(CAST(l_quantity AS DOUBLE), 0.9, 1000)"), 4).as("p90_approx"),
        round(expr("percentile(CAST(l_quantity AS DOUBLE), 0.9)"), 4).as("p90_exact"))
      .select(col("l_returnflag"), col("n"),
        col("p50_approx"), col("p50_exact"),
        round(abs(col("p50_approx") - col("p50_exact")) /
          greatest(col("p50_exact"), lit(1.0)), 4).as("p50_rel_err"),
        col("p90_approx"), col("p90_exact"),
        round(abs(col("p90_approx") - col("p90_exact")) /
          greatest(col("p90_exact"), lit(1.0)), 4).as("p90_rel_err"))
      .orderBy(col("l_returnflag"))

  /** q61: arg-min/arg-max aggregation — q27's "latest event per user"
    * projection WITHOUT a window: `max_by`/`min_by` over a total-order key
    * collapse map-side like any other aggregate, so the per-user answer
    * shuffles as ONE pre-combined row instead of sorting every event of a
    * partition the way row_number does. At 100 TB that is the difference
    * between a partial-agg shuffle of O(users) rows and a full sort of
    * O(events).
    *
    * The ordering key is a fixed-width string — zero-padded epoch-micros ‖
    * zero-padded event_id — so lexicographic compare == (ts, event_id)
    * order, it is TOTAL (unique event_id breaks ts ties → max_by is
    * deterministic), and both engines compare the identical ASCII bytes
    * (DuckDB mirror: arg_min/arg_max over the same lpad key).
    *
    * NULL-payload caveat (latent, documented at the oracle too): Spark's
    * max_by returns the value AT the winning key even when that value is
    * NULL; DuckDB's arg_max SKIPS null-arg rows and falls back to an
    * earlier key. events.value/event_type are non-null by schema in the
    * testdata, so the engines agree here — if this operator is pointed at
    * a nullable payload, coalesce the payload into the ordering struct on
    * both sides first. */
  def q61(spark: SparkSession, sfDir: String): DataFrame = {
    val key = concat(
      lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
      lpad(col("event_id").cast("string"), 12, "0"))
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min_by(col("event_type"), key).as("first_type"),
        min(col("ts")).as("first_ts"),
        max_by(col("event_type"), key).as("last_type"),
        max_by(col("value"), key).as("last_value"),
        max(col("ts")).as("last_ts"))
      .orderBy(col("user_id"))
  }

  /** q63: ordered event journey per user — the whole event sequence
    * collapsed to one `a>b>c` string, the session-mining / behavioral-
    * sequence representation (and the input shape of an n-gram model over
    * ACTIONS rather than tokens, the event-log analogue of q64).
    * Determinism: collect_list is shuffle-ordered, so the list is sorted by
    * an embedded (epoch-micros, event_id) struct key — total order, unique
    * tiebreak — before the types are extracted; DuckDB mirrors with
    * `string_agg(… ORDER BY ts, event_id)`. Same sort-the-collected-array
    * pattern as q34's signature assembly: the per-user array is the ONLY
    * thing sorted, never the stream. */
  def q63(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        array_join(
          transform(
            array_sort(collect_list(struct(
              unix_micros(col("ts")).as("k1"), col("event_id").as("k2"),
              col("event_type").as("v")))),
            s => s.getField("v")),
          ">").as("journey"))
      .orderBy(col("user_id"))

  /** q49: CUBE over return flag × line status — all four grouping-set
    * combinations, disambiguated from real NULLs by GROUPING flags
    * (determinism rule for q11's ROLLUP applied to the full lattice). */
  def q49(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).as("g_rf"),
        grouping(col("l_linestatus")).as("g_ls"),
        count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"), col("l_linestatus"))
}
