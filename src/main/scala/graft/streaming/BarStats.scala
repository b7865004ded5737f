package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.Stats

/** s38: streaming OHLC bar maintenance — q159's hourly bars kept current
  * as events land, the continuous-aggregation job every time-series
  * store (candlesticks, metrics rollups) runs at ingest. Each batch
  * writes its own per-(type, bar) partials through q159's OWN
  * `Stats.barPartials` kernel; the read merges them with the SAME
  * `Stats.mergeBars` + `Stats.finishBars` the batch query uses — one
  * definition per stage, parity by construction.
  *
  * Additive family (s16/s21/s26/s36): every partial column merges by an
  * associative AND commutative operation — open/close ride min/max over
  * the (ts, event_id, value) struct (the (ts, event_id) total order is
  * unique, so merges can never tie on the value), high/low are min/max,
  * n and the decimal volume are sums. Parity therefore holds under ANY
  * batch split with no arrival-order assumption, and replay of batch b
  * recomputes byte-identical partials and dynamic-overwrites its own
  * batch_id partition (the standard replay no-op argument).
  *
  * Scale posture: per batch ONE map-side-combined aggregate of the batch
  * only; the store grows one calendar-bounded partition per batch
  * (types × hours rows); the read shuffles ≤ partials × batches rows.
  * Folding old partitions is s21's watermark compaction — every column
  * is pointwise re-mergeable.
  */
object BarStats {

  private def emptyPartials(spark: SparkSession): DataFrame =
    Stats.barPartials(spark.range(0).select(
      lit("").as("event_type"), lit(null).cast("timestamp").as("ts"),
      lit(0L).as("event_id"), lit(0.0).as("value")))

  /** One micro-batch of (event_id, ts, event_type, value): q159 partials
    * → the batch's own partition. */
  def processBatch(batch: DataFrame, storeDir: String, batchId: Long): Unit = {
    if (batch.isEmpty) return
    Stats.barPartials(batch)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(storeDir)
  }

  /** The q159-shaped bar report over everything ingested so far —
    * row-for-row equal to batch q159 on the concatenated log under ANY
    * batch split. */
  def bars(spark: SparkSession, storeDir: String): DataFrame = {
    val partials =
      if (!StoreRead.hasParquetData(spark, storeDir)) emptyPartials(spark)
      else spark.read.parquet(storeDir).drop("batch_id")
    Stats.finishBars(Stats.mergeBars(partials))
  }

  /** Wire a streaming (event_id, ts, event_type, value) source in. */
  def start(events: DataFrame, storeDir: String, checkpointDir: String): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, storeDir, batchId)
      }
      .start()
}
