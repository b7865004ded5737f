package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.Stats

/** s42: streaming A/B experiment readout — q165's 2×2 chi-square kept
  * re-posable as events land: the experiment dashboard every platform
  * polls while a test runs ("is it significant YET?" is intrinsically a
  * streaming question). Each batch writes per-user conversion-flag
  * partials through q165's OWN `Stats.userConv` kernel (a 0/1 MAX —
  * associative + commutative); the read merges per user and runs the
  * SAME `Stats.chisqOfConv` finisher, so the test statistic exists
  * exactly once.
  *
  * Additive family: MAX partials merge under ANY batch split (a user's
  * conversion may land in any batch — the merged flag is the same);
  * replay of batch b recomputes byte-identical partials and
  * dynamic-overwrites its own batch_id partition.
  *
  * Scale posture: per batch ONE map-side-combined per-user aggregate of
  * the batch only; the read merges O(users) flag partials into the
  * four-long global aggregate — the dashboard poll costs one panel
  * pass, never a log rescan.
  */
object ChisqMonitor {

  private def emptyConv(spark: SparkSession): DataFrame =
    spark.range(0).select(lit(0L).as("user_id"), lit(0L).as("conv"))

  /** One micro-batch of (user_id, event_type): per-user conversion-flag
    * partials → the batch's own partition. */
  def processBatch(batch: DataFrame, storeDir: String, batchId: Long): Unit = {
    if (batch.isEmpty) return
    Stats.userConv(batch)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(storeDir)
  }

  /** The q165-shaped experiment readout over everything ingested so far
    * — row-for-row equal to batch q165 on the concatenated log under ANY
    * batch split. */
  def readout(spark: SparkSession, storeDir: String): DataFrame = {
    val conv =
      if (!StoreRead.hasParquetData(spark, storeDir)) emptyConv(spark)
      else spark.read.parquet(storeDir)
        .groupBy(col("user_id"))
        .agg(max(col("conv")).as("conv"))
    Stats.chisqOfConv(conv)
  }

  /** Wire a streaming (user_id, event_type) source into the loop. */
  def start(events: DataFrame, storeDir: String, checkpointDir: String): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, storeDir, batchId)
      }
      .start()
}
