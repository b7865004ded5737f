package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** s26: streaming ledger reconciliation — the online form of q115's
  * full-outer projection-pair audit: events arrive in micro-batches and
  * the per-user click/purchase ledgers are maintained as a store of
  * ADDITIVE exact partials (per (user, batch): click count, purchase
  * count, purchase value as DECIMAL(18,4)) instead of re-scanning the
  * log. The panel read merges the partials (sum/sum/sum — exact and
  * associative, so the merge commutes with ANY batch split: this family
  * needs no arrival-order assumption, a strictly stronger law than the
  * s23/s24/s25 tail-store fold) and pushes the two aggregated frames
  * through the SAME `Relational.reconcile` assembly batch q115 uses —
  * presence/NULL discipline and the null-user one-row-per-side semantics
  * included, parity by construction.
  *
  * Replay safety is s16/s21's additive-store argument: a re-run of batch
  * b recomputes byte-identical partials and dynamic-overwrites its own
  * batch_id partition — the summed read cannot tell. The store grows one
  * user-cardinality-bounded partition per batch; folding old partitions
  * into a base is s21's watermark compaction verbatim (the partials are
  * pointwise-summable), applied when the partition count, not this
  * logic, demands it.
  *
  * Scale posture: per batch ONE user_id-keyed map-side-combined
  * aggregate of the batch only; the panel read is one shuffle over the
  * store (≤ users × uncompacted batches rows) feeding q115's
  * already-reduced full-outer — the event log itself is never re-read.
  */
object LedgerStore {

  private def emptyLedger(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("user_id"), lit("").as("presence"),
      lit(0L).as("n_clicks"), lit(0L).as("n_purchases"),
      lit(null).cast("double").as("purchase_value"))

  /** One micro-batch of (user_id, event_type, value): exact per-user
    * partials → the batch's own partition. */
  def processBatch(batch: DataFrame, storeDir: String, batchId: Long): Unit = {
    if (batch.isEmpty) return
    batch.filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"),
        sum(when(col("event_type") === "purchase",
          col("value").cast("decimal(18,4)"))).as("pv"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(storeDir)
  }

  /** The q115-shaped reconciliation over everything ingested so far —
    * row-for-row equal to batch q115 on the concatenated log under ANY
    * batch split (the partial merge is associative and commutative). */
  def ledger(spark: SparkSession, storeDir: String): DataFrame = {
    if (!StoreRead.hasParquetData(spark, storeDir)) return emptyLedger(spark)
    val totals = spark.read.parquet(storeDir)
      .groupBy(col("user_id"))
      .agg(sum(col("c")).as("c"), sum(col("p")).as("p"), sum(col("pv")).as("pv"))
      // feeds both sides of the full-outer below (r9 pinning discipline)
      .localCheckpoint(true)
    val clicks = totals.filter(col("c") > 0L)
      .select(col("user_id"), col("c").as("n_clicks"))
    val purchases = totals.filter(col("p") > 0L)
      .select(col("user_id"), col("p").as("n_purchases"),
        col("pv").cast("double").as("purchase_value"))
    graft.queries.Relational.reconcile(clicks, purchases)
  }

  /** Wire a streaming (user_id, event_type, value) source into the loop. */
  def start(events: DataFrame, storeDir: String, checkpointDir: String): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, storeDir, batchId)
      }
      .start()
}
