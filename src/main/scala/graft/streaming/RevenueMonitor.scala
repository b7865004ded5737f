package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.Stats

/** s47: streaming revenue-inequality maintenance — q173's Gini and
  * q174's Lorenz decile table re-posable as orders land: the
  * concentration dashboard of a marketplace whose order stream never
  * stops. Each batch writes per-customer cent-sum partials (SUM —
  * associative + commutative); the reads merge per customer and run the
  * SAME `Stats.revenueGini` / `Stats.revenueDeciles` kernels batch
  * q173/q174 run (the kernels' own per-customer aggregate makes the
  * merged partials indistinguishable from raw rows).
  *
  * Additive family: parity under ANY batch split, replay
  * dynamic-overwrites its own batch_id partition byte-identically. The
  * rank structure (who sits in which decile) is NOT mergeable — a
  * customer's rank moves every time anyone spends — which is exactly why
  * the store holds the mergeable cent sums and the two-phase prefix
  * ranks are derived at read (the s39/s41 boundary argument, here for
  * ORDER STATISTICS).
  *
  * Scale posture: per batch ONE map-side-combined per-customer aggregate
  * of the batch only; the read merges O(customers) partials into the
  * q72-style two-phase prefix — no global sort, no unpartitioned window,
  * at any corpus size.
  */
object RevenueMonitor {

  private def emptyRows(spark: SparkSession): DataFrame =
    spark.range(0).select(lit(0L).as("o_custkey"), lit(0L).as("cents"))

  /** One micro-batch of (o_custkey, cents): per-customer sum partials →
    * the batch's own partition. */
  def processBatch(batch: DataFrame, storeDir: String, batchId: Long): Unit = {
    if (batch.isEmpty) return
    batch.groupBy(col("o_custkey")).agg(sum(col("cents")).as("cents"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(storeDir)
  }

  private def merged(spark: SparkSession, storeDir: String): DataFrame =
    if (!StoreRead.hasParquetData(spark, storeDir)) emptyRows(spark)
    else spark.read.parquet(storeDir).select(col("o_custkey"), col("cents"))

  /** q173-shaped Gini over everything ingested so far. */
  def gini(spark: SparkSession, storeDir: String): DataFrame =
    Stats.revenueGini(merged(spark, storeDir))

  /** q174-shaped Lorenz decile table over everything ingested so far. */
  def deciles(spark: SparkSession, storeDir: String): DataFrame =
    Stats.revenueDeciles(merged(spark, storeDir))

  /** Wire a streaming (o_custkey, cents) source into the loop. */
  def start(orders: DataFrame, storeDir: String, checkpointDir: String): StreamingQuery =
    orders.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, storeDir, batchId)
      }
      .start()
}
