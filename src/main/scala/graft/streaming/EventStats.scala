package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** s05: watermarked windowed aggregation over an event stream.
  *
  * 10-minute watermark on `ts`: events later than that are dropped from
  * windowed aggregates — a bounded-state upgrade over the reference, which
  * drops *everything* before consumer start (iterator Latest,
  * consumer/consumer.go:64) and otherwise never bounds anything.
  *
  * Works on any DataFrame (batch or streaming) with ts/event_type/amount —
  * in batch mode the watermark is a no-op and the result matches
  * q23_window_tumbling's shape, which is the batch/streaming parity the
  * survey's q23 row declares.
  */
object EventStats {

  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("amount")).as("total_amount"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_amount"))

  /** s12: EXACT distinct users per tumbling window on a live stream —
    * q75's unique-visitors shape running incrementally. Streaming
    * aggregation does not support count(DISTINCT …) (the final agg can't
    * retract), so the distinct is decomposed into its two stateful
    * halves: a keyed dedup on (window, user) — watermark-bounded state,
    * exactly-once per key — followed by a plain windowed count. Append
    * mode emits each window's final count once the watermark passes its
    * end; state per window is O(distinct users), the same as the batch
    * expand-dedup plan's shuffle footprint. Batch parity: on a static
    * frame the same two steps reproduce q75's n_users exactly
    * (StreamingSpec pins it). */
  def hourlyDistinctUsers(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .select(window(col("ts"), "1 hour").as("win"), col("user_id"))
      .dropDuplicates("win", "user_id")
      .groupBy(col("win"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("win.start").as("win_start"), col("n_users"))

  /** s10: per-user session windows on a live stream — q25's sessionization
    * (30-minute inactivity gap, session_end = last ts + gap) running
    * incrementally: a session's row is emitted exactly once, when the
    * watermark passes its close (append mode), and the watermark bounds
    * the open-session state — the streaming form of the batch
    * gaps-and-islands oracle. Works on batch DataFrames too (watermark is
    * a no-op there), which is what the StreamingSpec parity test pins
    * against q25. */
  def sessionsByUser(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))
}
