package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Rate-source ingest for [[BnplPipeline]] (r12 verdict item 5): drives
  * the SAME CQRS cascade from Spark's built-in `rate` source — the one
  * shipped zero-dependency source family the engine had never exercised
  * (s28 covered MemoryStream; files are s01). The reference's poll loop
  * is source-agnostic (consumer/consumer.go:75-96), so a synthetic
  * load-generator transport must produce byte-identical downstream state
  * to the file transport fed the same envelopes — the s30 parity law.
  *
  * Shape: each rate row (timestamp, value) becomes one purchase envelope,
  * deterministic in `value` — ids, user, amount AND event time (base +
  * value·interval). Event time must NOT come from the rate source's own
  * `timestamp`: every query over the frame instantiates its OWN rate
  * reader with its own epoch, so the same `value` carries different
  * timestamps in different queries (observed: the derive query's promise
  * ts ~100 ms off the log query's purchase ts). A load generator stamps
  * event time deterministically; the rate source supplies cadence.
  * The rate source cannot accept posts, so the derived-promise self-loop
  * (consumer/consumer.go:142-144) runs through a JSON-file side channel
  * UNIONED into the ingest — the same wire format the file producer
  * writes, parsed by the same [[Envelope.schema]].
  *
  * Why a FILE loop and not s28's MemoryStream: [[BnplPipeline]] runs five
  * independent queries over one source frame, and Spark 4's MemoryStream
  * asserts MONOTONIC commits across everything committing into it —
  * with the rate source advancing each query at its own pace, two
  * queries' interleaved commits trip `Offsets committed out of order`
  * (observed). The file source's commit is a no-op, so it tolerates
  * multi-query fan-out; s28 only survives because its test drains run
  * the queries in lockstep.
  *
  * Scale posture: `rate` is Spark's standard throughput harness (per-
  * partition row generation, backpressure-aware); everything downstream
  * is the unchanged keyed cascade. The loop append is a distributed
  * write, not a driver collect.
  */
object RateBroker {

  /** Returns the (stream, republish) pair for [[BnplPipeline]]'s `broker`
    * parameter. `loopDir` is the self-loop channel directory (created
    * here); `users` fans the synthetic purchases over a fixed key space
    * so the keyed projections see real grouping. */
  def apply(spark: SparkSession, loopDir: String, rowsPerSecond: Int = 50,
      users: Int = 7): (DataFrame, DataFrame => Unit) = {
    new java.io.File(loopDir).mkdirs()
    val purchases = spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond.toLong)
      .load()
      .select(
        concat(lit("rate-"), col("value")).as("event_id"),
        lit(Envelope.PurchaseCompleted).as("event_type"),
        // multiply BEFORE dividing (advisor r13): `1000L / rowsPerSecond`
        // in Scala is integer division — any rate > 1000 rows/s silently
        // yielded a 0 ms step (every envelope on one event time, degrading
        // the watermark/dedup path) and non-divisors truncated the cadence.
        // value·1000 stays exact in DOUBLE far past any run length; the
        // floor cast keeps the millisecond grid.
        timestamp_millis(lit(1700000000000L) +
          (col("value") * lit(1000L) / lit(rowsPerSecond.toLong)).cast("long")).as("ts"),
        concat(lit("order-"), col("value")).as("order_id"),
        concat(lit("u"), pmod(col("value"), lit(users.toLong))).as("user_id"),
        ((pmod(col("value"), lit(50L)) + 1L) * 100L).as("amount"),
        lit(null).cast("string").as("promise_id"),
        lit(null).cast("string").as("bill_id"),
        lit(null).cast("string").as("due_date"),
        lit(null).cast("string").as("payment_mode"),
        lit(null).cast("string").as("issued_date"),
        lit(null).cast("string").as("paid_date"))
    val loop = spark.readStream.schema(Envelope.schema).json(loopDir)
    val repub = (batch: DataFrame) =>
      if (!batch.isEmpty) batch.write.mode(SaveMode.Append).json(loopDir)
    (purchases.unionByName(loop), repub)
  }
}
