package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.Behavior

/** s37: streaming RFM segmentation — q156's segment grid maintained as
  * events land: LIVE behavioral segmentation, the panel a marketing /
  * curation deployment reads between batches instead of re-scanning the
  * log. The per-user metric triple is ADDITIVE (last_ts merges by MAX,
  * frequency and cents by SUM — all associative and commutative), so the
  * store is the s16/s21/s26/s29 additive class: per-(user, batch)
  * partials in the batch's own partition, merged at read, parity under
  * ANY batch split with no arrival-order assumption. The merged metric
  * frame then runs the SAME `Behavior.rfmSegments` quantile finisher
  * batch q156 runs — disc-percentile boundaries, dollar grid, log-clock
  * anchor included — so batch and stream segment identically by
  * construction (the q135→s29 / q151→s36 kernel-sharing discipline).
  *
  * Note the quantile boundaries are DERIVED, not stored: quantiles are
  * not mergeable statistics, so the read recomputes them from the merged
  * metrics — which stay one row per (user, batch-partial), never
  * event-scale. Replay of batch b recomputes byte-identical partials and
  * dynamic-overwrites its own partition; folding old partitions is s21's
  * watermark compaction (MAX/SUM partials are pointwise-mergeable).
  *
  * Scale posture: per batch ONE map-side-combined per-user aggregate of
  * the batch only (`Behavior.rfmMetrics` — the shared kernel); the read
  * merges ≤ users × uncompacted-batches partial rows and runs q156's
  * bounded-histogram machinery.
  */
object RfmMonitor {

  private def emptyMetrics(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("user_id"),
      lit(null).cast("timestamp").as("last_ts"),
      col("id").as("frequency"), col("id").as("cents"))

  /** One micro-batch of (user_id, ts, value): the batch's own per-user
    * metric partials → its own partition. */
  def processBatch(batch: DataFrame, storeDir: String, batchId: Long): Unit = {
    if (batch.isEmpty) return
    Behavior.rfmMetrics(batch)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(storeDir)
  }

  /** The merged per-user metric frame over everything ingested. */
  private[graft] def metrics(spark: SparkSession, storeDir: String): DataFrame = {
    if (!StoreRead.hasParquetData(spark, storeDir)) return emptyMetrics(spark)
    spark.read.parquet(storeDir)
      .groupBy(col("user_id"))
      .agg(max(col("last_ts")).as("last_ts"), sum(col("frequency")).as("frequency"),
        sum(col("cents")).as("cents"))
  }

  /** The q156-shaped segment grid over everything ingested so far —
    * row-for-row equal to batch q156 on the concatenated log under ANY
    * batch split. */
  def segments(spark: SparkSession, storeDir: String): DataFrame =
    Behavior.rfmSegments(metrics(spark, storeDir))

  /** Wire a streaming (user_id, ts, value) source into the loop. */
  def start(events: DataFrame, storeDir: String, checkpointDir: String): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, storeDir, batchId)
      }
      .start()
}
