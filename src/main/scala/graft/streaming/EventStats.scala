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
}
