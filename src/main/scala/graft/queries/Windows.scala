package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Dsl._
import graft.tables.Tables

/** Window functions and time windows (SURVEY.md §2.2 q12, q13, q23–q25, q27).
  *
  * Every window partitions by a key (custkey / user_id) — never a global
  * unpartitioned window, which would serialize all rows through one task at
  * scale. This is the deliberate weakening of the reference's single-shard
  * total order (producer/producer.go:24) to per-key order (SURVEY.md §7.5).
  */
object Windows {

  /** q12: top-3 orders per customer. row_number with a unique tiebreak is
    * the deterministic filter; rank/dense_rank expose tie semantics.
    * WindowGroupLimit pushes the rn<=3 limit into the sort. */
  def q12(spark: SparkSession, sfDir: String): DataFrame = {
    val byPrice  = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val tiesOnly = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc)
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(byPrice).as("rn"),
        rank().over(tiesOnly).as("rnk"),
        dense_rank().over(tiesOnly).as("drnk"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** q13: lag/lead and a running sum per user over the event stream —
    * the analytic-frame surface. Running sum is exact decimal, cast out. */
  def q13(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        sum(col("value").cast("decimal(18,4)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_sum"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** q23: 1-hour tumbling windows per event type, via the same `window()`
    * expression the streaming pipeline uses (batch/streaming parity). */
  def q23(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("win_start"), col("event_type"))

  /** q75: windowed distinct cardinality — per 1-hour tumbling window:
    * event volume, EXACT distinct users, distinct event types. The
    * unique-visitors-per-interval shape next to q23's plain windowed agg.
    *
    * Scale posture: exact distinct per window plans as the two-phase
    * expand + partial dedup aggregate — one shuffle keyed on (window,
    * value), partials combine map-side; the sketch form of the same
    * answer at 100 TB is `approx_count_distinct` (q53's HLL, mergeable
    * O(1) state per window), kept out of this oracle-checked query
    * because sketch registers are engine-specific. */
  def q75(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_type")).as("n_types"))
      .select(col("window.start").as("win_start"),
        col("n_events"), col("n_users"), col("n_types"))
      .orderBy(col("win_start"))

  /** q24: 1-hour windows hopping every 30 minutes — each event lands in
    * exactly two windows. */
  def q24(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
              col("n"), col("sum_value"))
      .orderBy(col("win_start"))

  /** q25: session windows with a 30-minute inactivity gap per user.
    * Spark merges while `ts <= prev_end` (verified in SemanticsSpec: an
    * event at exactly prev_ts + gap MERGES); the oracle's gaps-and-islands
    * SQL therefore starts a new session iff `ts - prev_ts > 30 min` —
    * strictly greater, same boundary (SURVEY.md §7.4.3).
    * session_end = last ts + gap, per Spark semantics. */
  def q25(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"), col("n_events"))
      .orderBy(col("user_id"), col("session_start"))

  /** q60: trailing 1-hour rolling aggregate per user — a RANGE frame over
    * event-time seconds (q13's ROWS frame counts rows; this one bounds by
    * TIME, the shape of rate limits / rolling spend caps / feature windows
    * in a training pipeline). Frame = [ts − 3599 s, ts]: both engines
    * window over the same floored epoch-second key, and RANGE includes
    * same-second peers identically, so the frame contents — and the exact
    * DECIMAL sum over them — are engine-identical. One shuffle on user_id;
    * state per partition is one sorted pass (Spark's WindowExec), no
    * self-join blowup. */
  def q60(spark: SparkSession, sfDir: String): DataFrame =
    rolling(Tables.events(spark, sfDir))

  /** q60 core on a plain DataFrame (event_id, user_id, ts, value) so
    * SemanticsSpec can pin the frame boundary (an event exactly 3600 s
    * earlier is OUTSIDE the trailing hour; 3599 s is inside). */
  private[graft] def rolling(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
      .rangeBetween(-3599, 0)
    events
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        unix_timestamp(col("ts")).as("sec"))
      .select(col("event_id"), col("user_id"), col("ts"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("value").cast("decimal(18,4)")).over(w).cast("double").as("sum_1h"))
      .orderBy(col("event_id"))
  }

  /** q69: distribution ranks — percent_rank / cume_dist / ntile(4) of
    * order value within each priority class: the quantile-rank features a
    * training pipeline derives per group ("is this order in its segment's
    * top decile?"). ntile assigns by ROW POSITION, so the window order must
    * be total — (o_totalprice, o_orderkey) — or bucket membership would be
    * shuffle-dependent; percent_rank/cume_dist are tie-stable but get the
    * same key for identical framing. Both engines define all three
    * identically (percent_rank = (rank−1)/(n−1), cume_dist = peers≤/n,
    * ntile = equal buckets with remainders to the front).
    *
    * Under the TOTAL window order rank = row_number and every peer group
    * is a singleton, so both distribution ranks are plain integer ratios —
    * computed explicitly and ROUND-4'd via ratio4 (D6: (rank−1)/(n−1) can
    * sit exactly on a .00005 boundary where the engines' ROUND rules
    * part). */
  def q69(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val part = Window.partitionBy(col("o_orderpriority"))
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(part).as("np"),
        ntile(4).over(w).as("quartile"))
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        when(col("np") === 1, lit(0.0))
          .otherwise(graft.ops.Dsl.ratio4(col("rn") - 1, col("np") - 1)).as("pct_rank"),
        graft.ops.Dsl.ratio4(col("rn"), col("np")).as("cume"),
        col("quartile"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
      .limit(1000)
  }

  /** q140: forward fill (last observation carried forward) — every event
    * annotated with the user's most recent purchase value at or before
    * it, NULL until the first purchase. The gap-filling shape every
    * time-series feature pipeline runs (sparse observations propagated
    * onto a dense event grid): `last(..., ignoreNulls)` over a per-user
    * (ts, event_id) frame — the unique event_id tiebreak makes the fill
    * deterministic under same-timestamp events, and the carried value is
    * an UNTOUCHED input column (no arithmetic, no float hazard; DuckDB
    * mirrors with last_value(... IGNORE NULLS) over the same frame).
    *
    * Scale posture: one shuffle on user_id, one sorted pass per
    * partition (WindowExec) — O(events) with per-user parallelism, never
    * a self-join against the purchase history; at 100 TB this is the
    * same partitioned-window discipline as q13/q27. */
  def q140(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        last(when(col("event_type") === "purchase", col("value")),
          ignoreNulls = true).over(w).as("last_purchase_value"))
      .orderBy(col("event_id"))
  }

  /** q141: longest same-type streak per user — the gaps-and-islands
    * pattern (session/streak detection by row-number difference): rn
    * over the user's full (ts, event_id) order minus rn over the
    * (user, type) order is CONSTANT exactly within a maximal run of
    * consecutive same-type events, so one groupBy on (user, type,
    * island) measures every run, and a per-user argmax (run length
    * desc, then first event_id — a total order) picks the longest.
    * Pure integer arithmetic end to end; the unique event_id tiebreak
    * in both row_numbers makes the islands deterministic under ts ties.
    *
    * Scale posture: both row_numbers share ONE user_id shuffle (same
    * partition key; the second window only re-sorts within partitions),
    * run measurement is a map-side-combinable count at run cardinality,
    * and the per-user argmax is a WindowGroupLimit top-1 — O(events)
    * with per-user parallelism, no self-join. */
  def q141(spark: SparkSession, sfDir: String): DataFrame =
    streaksOn(Tables.events(spark, sfDir))

  /** q141 kernel on an arbitrary (user_id, event_type, ts, event_id)
    * frame — the spec seam (planted-streak laws in SemanticsSpec). */
  def streaksOn(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val byUserType = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val runs = events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        (row_number().over(byUser) - row_number().over(byUserType)).as("island"))
      .groupBy(col("user_id"), col("event_type"), col("island"))
      .agg(count(lit(1)).as("run_len"), min(col("event_id")).as("start_event_id"))
    val best = Window.partitionBy(col("user_id"))
      .orderBy(col("run_len").desc, col("start_event_id"))
    runs
      .select(col("user_id"), col("event_type"), col("run_len"),
        col("start_event_id"), row_number().over(best).as("rn"))
      .filter(col("rn") === 1)
      .drop("rn")
      .orderBy(col("user_id"))
  }

  /** q27: last-writer-wins projection — THE reference read-model semantic
    * (R8, consumer/consumer.go:214-220): latest event per user, ties broken
    * by event_id, exactly how the streaming upsert resolves replays. */
  def q27(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("value"), col("ts"),
              row_number().over(w).as("rn"))
      .filter(col("rn") === 1)
      .drop("rn")
      .orderBy(col("user_id"))
  }

  /** q178: session entry→exit flow report — q25's gap sessionization
    * upgraded from counts to the web-analytics staple: per (entry event
    * type, exit event type), the session count, the BOUNCE count
    * (single-event sessions — where entry IS exit by construction), the
    * bounce rate and the mean session duration in seconds. "Where do
    * journeys start, where do they die" is the first read any event
    * platform's session layer serves.
    *
    * Entry/exit ride min/max over the (ts, event_id, event_type) struct
    * (q159's discipline — the unique (ts, event_id) order decides, the
    * type field never compares); durations are exact epoch micros; the
    * mean is ratio4dec(Σ dur_us, n·10⁶) — exact half-up seconds. The
    * session boundary is the SAME 30-minute gap rule as q25 (exact-gap
    * merges), mirrored by the oracle's lag+cumsum sessionization.
    *
    * Scale posture: session_window's one user-keyed shuffle (q25's
    * plan), then a ≤ |types|²-cardinality map-side-combined aggregate. */
  def q178(spark: SparkSession, sfDir: String): DataFrame =
    sessionFlow(Tables.events(spark, sfDir))

  /** q178 kernel on an arbitrary event frame (planted-data seam). */
  private[graft] def sessionFlow(ev: DataFrame): DataFrame =
    flowOf(sessionize(ev))

  /** The per-session partial frame (user_id, first, last, n_events) —
    * the unit the s49 streaming tracker stores (its open-session state
    * IS one of these rows) and merges at batch seams. */
  private[graft] def sessionize(ev: DataFrame): DataFrame =
    ev.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(min(struct(col("ts"), col("event_id"), col("event_type"))).as("first"),
        max(struct(col("ts"), col("event_id"), col("event_type"))).as("last"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("first"), col("last"), col("n_events"))

  /** The flow finisher on a session-partial frame — the seam the s49
    * read enters through, so stream and batch share one report. */
  private[graft] def flowOf(sessions: DataFrame): DataFrame =
    sessions
      .groupBy(col("first.event_type").as("entry_type"),
        col("last.event_type").as("exit_type"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounce"),
        sum(unix_micros(col("last.ts")) - unix_micros(col("first.ts"))).as("dur_us"))
      .select(col("entry_type"), col("exit_type"), col("n_sessions"),
        col("n_bounce"),
        ratio4(col("n_bounce"), col("n_sessions")).as("bounce4"),
        ratio4dec(col("dur_us"),
          col("n_sessions").cast("decimal(38,0)") * 1000000).as("mean_dur_s4"))
      .orderBy(col("entry_type"), col("exit_type"))
}
