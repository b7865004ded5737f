package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.Stats

/** s29: streaming distribution-drift monitor — the online form of q135's
  * two-sample Kolmogorov–Smirnov matrix: events arrive in micro-batches
  * and the per-(event_type, value) observation counts are maintained as
  * a store of ADDITIVE exact partials (s26's store class), so the drift
  * read never re-scans the event log. The read merges the partials (one
  * integer sum — exact, associative, commutative: parity holds under
  * ANY batch split, no arrival-order assumption) and pushes the summed
  * counts through the SAME `Stats.ksOfCounts` kernel batch q135 uses —
  * the exact-integer ECDF supremum, DECIMAL(38,0) products and ratio4dec
  * quotient included, parity by construction.
  *
  * This closes the monitoring loop the batch layer opened (q132 EWMA,
  * q133 spikes, q135 drift): the production deployment points this at
  * the live feed and reads the matrix between batches — "is yesterday's
  * value distribution drifting from today's?" without an O(log) rescan.
  *
  * Replay safety is the additive-store argument (s16/s21/s26): a re-run
  * of batch b recomputes byte-identical counts and dynamic-overwrites
  * its own batch_id partition — the summed read cannot tell. The store
  * grows one quantization-bounded partition per batch (distinct
  * (type, value) pairs, NOT batch rows — the 2-decimal value grid bounds
  * it regardless of volume); folding old partitions into a base is
  * s21's watermark compaction verbatim (counts are pointwise-summable).
  *
  * Scale posture: per batch ONE (type, value)-keyed map-side-combined
  * aggregate of the batch only; the drift read is one shuffle over the
  * store (≤ grid × uncompacted batches rows) feeding q135's
  * already-bounded pair kernel — the event log itself is never re-read.
  *
  * STORE-FORMAT BREAK (r14, advisor-flagged r15): the partial schema
  * gained the day column `d` in r14 (to serve the s48 band read), so a
  * store written by pre-r14 code fails the merged read with a missing
  * column. Partials are derived state — rebuild by replaying the event
  * log through `processBatch` (the replay law makes this exact); there
  * is deliberately no silent read-side default, because an old partition
  * coalesced onto a sentinel day would CORRUPT the s48 calendar slices
  * while appearing to work. (SeasonalMonitor's r14 `sum_v` widening has
  * the same posture.) Read-cost note (advisor r15): the day axis
  * multiplies per-batch partition cardinality (types × days × values),
  * so the drift/IQR reads merge ~days× more rows per uncompacted batch —
  * still quantization-bounded; if it ever shows up at scale, s21's
  * watermark compaction can fold the day axis out of partitions older
  * than the band horizon (bands only read recent days).
  */
object DriftMonitor {

  private def emptyCounts(spark: SparkSession): DataFrame =
    spark.range(0).select(lit("").as("event_type"),
      lit(null).cast("date").as("d"), lit(0.0).as("value"), lit(0L).as("cnt"))

  /** One micro-batch of (event_type, ts, value): exact per-(type, day,
    * value) counts → the batch's own partition. The day column was added
    * in r14 so the same store serves the calendar-sliced band read (s48);
    * the drift/IQR reads simply merge across it. */
  def processBatch(batch: DataFrame, storeDir: String, batchId: Long): Unit = {
    if (batch.isEmpty) return
    batch.select(col("event_type"),
        to_date(date_trunc("day", col("ts"))).as("d"), col("value"))
      .groupBy(col("event_type"), col("d"), col("value"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(storeDir)
  }

  /** The q135-shaped KS drift matrix over everything ingested so far —
    * row-for-row equal to batch q135 on the concatenated log under ANY
    * batch split (the count merge is associative and commutative). */
  def drift(spark: SparkSession, storeDir: String): DataFrame = {
    val counts =
      if (!StoreRead.hasParquetData(spark, storeDir)) emptyCounts(spark)
      else spark.read.parquet(storeDir)
        .groupBy(col("event_type"), col("value"))
        .agg(sum(col("cnt")).as("cnt"))
    Stats.ksOfCounts(counts)
  }

  /** s45: the SECOND read of this store — q168's Tukey box-plot profile
    * and 1.5·IQR outlier counts over the same merged value histogram,
    * through the SAME `Stats.iqrOfValueCounts` kernel batch q168 runs.
    * One additive value-count store, two distribution reads (KS drift +
    * IQR profile) — the s36/s39 economics on the value axis. Row-for-row
    * equal to batch q168 under ANY batch split; replay no-op inherits
    * from the shared store. */
  def iqr(spark: SparkSession, storeDir: String): DataFrame = {
    val counts =
      if (!StoreRead.hasParquetData(spark, storeDir)) emptyCounts(spark)
      else spark.read.parquet(storeDir)
        .groupBy(col("event_type"), col("value"))
        .agg(sum(col("cnt")).as("cnt"))
    Stats.iqrOfValueCounts(counts)
  }

  /** s48: the THIRD read of this store — q179's daily p10/p50/p90 value
    * bands over the calendar-sliced histogram, through the SAME
    * `Stats.bandsOfCounts` kernel batch q179 runs (the r14 day-widened
    * partials make this read possible; drift and IQR keep merging across
    * the day axis). Row-for-row equal to batch q179 under ANY batch
    * split; replay no-op inherits from the shared store. */
  def bands(spark: SparkSession, storeDir: String): DataFrame = {
    val counts =
      if (!StoreRead.hasParquetData(spark, storeDir)) emptyCounts(spark)
      else spark.read.parquet(storeDir)
        .groupBy(col("event_type"), col("d"), col("value"))
        .agg(sum(col("cnt")).as("cnt"))
    Stats.bandsOfCounts(counts)
  }

  /** Wire a streaming (event_type, ts, value) source into the loop. */
  def start(events: DataFrame, storeDir: String, checkpointDir: String): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, storeDir, batchId)
      }
      .start()
}
