package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** s25: streaming funnel tracking — the online form of q62, the last
  * event-journey family member to get a streaming twin (q62 funnel /
  * q63 journey / q86 retention are the batch faces). Events arrive in
  * micro-batches (per-user ts order when the upstream is the log feed)
  * and each batch advances the SAME per-user funnel a single batch q62
  * pass would compute, by carrying exactly the state the fold needs:
  * each user's stage-entry timestamps (t_signup, t_view, t_click,
  * t_purchase) — one row per funnel-entered user, the s24 tail-store
  * discipline with the funnel tuple as the tail.
  *
  * The per-batch kernel IS batch q62 (`graft.queries.Events.funnel` —
  * one stage-chain definition everywhere): the stored tail is expanded
  * back into one synthetic event per completed stage and unioned with
  * the batch's events, and the kernel re-derives the tuple. That
  * reconstruction is exact under in-order arrival: the strict-chain
  * filters (`ts > t_prev`) make each stage timestamp FINAL the moment it
  * is set (a later event can never produce an earlier qualifying ts),
  * and a prior event that did NOT qualify can never qualify later —
  * a view discarded because no signup preceded it would need a future
  * signup with a SMALLER ts to start qualifying, which in-order arrival
  * rules out. So the four timestamps are the fold's entire state and
  * dropped events are dead weight, the s23/s24 left-fold argument.
  *
  * Store layout and replay safety are s24's verbatim: tails LWW by
  * batch_id in batch_id partitions; a re-run of batch b reads only tails
  * with batch_id < b (its own previous writes invisible), recomputes
  * byte-identically, and dynamic overwrite replaces its own partition.
  *
  * Batch-parity law (StreamingSpec): when each user's events arrive in
  * ts order across batches, [[funnelState]] EQUALS batch q62 on the
  * concatenated log row-for-row, including the NULL-user group (the
  * kernel's equi-joins strand null users at the signup stage in BOTH
  * forms — same kernel, same semantics).
  */
object FunnelTracker {

  private def emptyTails(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("user_id"),
      lit(null).cast("timestamp").as("t_signup"),
      lit(null).cast("timestamp").as("t_view"),
      lit(null).cast("timestamp").as("t_click"),
      lit(null).cast("timestamp").as("t_purchase"),
      lit(0).as("stages_completed"))

  /** Live funnel tuple per user: highest-batch_id tail row below
    * `batchId`. Schema-stable empty frame before any write. */
  private[graft] def readTails(spark: SparkSession, tailDir: String,
      batchId: Long): DataFrame = {
    if (!StoreRead.hasParquetData(spark, tailDir)) return emptyTails(spark)
    val w = Window.partitionBy(col("user_id")).orderBy(col("batch_id").desc)
    spark.read.parquet(tailDir)
      .filter(col("batch_id") < batchId) // replay: never see own tails
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("t_signup"), col("t_view"),
        col("t_click"), col("t_purchase"), col("stages_completed"))
  }

  /** One micro-batch of (user_id, event_type, ts): advance the touched
    * users' funnels, write the new tails to the batch's own partition. */
  def processBatch(batch: DataFrame, tailDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    val ev = batch.select(col("user_id"), col("event_type"), col("ts"))
    // only the batch's users can advance; everyone else's tail stays
    // live in an older partition untouched. NULL-safe semi join: the
    // null-user group carries a tail like any key (it enters the funnel
    // at signup and strands there — the kernel's own semantics).
    val stored = readTails(spark, tailDir, batchId)
    val batchUsers = ev.select(col("user_id").as("bu")).distinct()
    val tails = stored
      .join(batchUsers, stored("user_id") <=> batchUsers("bu"), "left_semi")
    // tail → one synthetic event per completed stage; the stored chain
    // is strictly increasing (the kernel's own filters built it), so the
    // kernel re-derives the identical tuple from it
    val synth = tails.select(col("user_id"), explode(array(
        struct(lit("signup").as("event_type"), col("t_signup").as("ts")),
        struct(lit("view").as("event_type"), col("t_view").as("ts")),
        struct(lit("click").as("event_type"), col("t_click").as("ts")),
        struct(lit("purchase").as("event_type"), col("t_purchase").as("ts"))))
        .as("e"))
      .filter(col("e.ts").isNotNull)
      .select(col("user_id"), col("e.event_type").as("event_type"),
        col("e.ts").as("ts"))
    // batch q62's kernel over tail-as-events ∪ batch — ONE user_id
    // shuffle family; eager pin before the dynamic overwrite of the
    // directory the plan itself reads (r9 pinning discipline)
    val state = graft.queries.Events.funnel(synth.unionByName(ev))
      .localCheckpoint(true)
    state.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(tailDir)
  }

  /** The q62-shaped funnel over everything ingested so far — row-for-row
    * equal to batch q62 on the concatenated log under in-order arrival. */
  def funnelState(spark: SparkSession, tailDir: String): DataFrame =
    readTails(spark, tailDir, Long.MaxValue)
      .orderBy(col("user_id"))

  /** The conversion panel a dashboard polls: users per completed-stage
    * count — O(4) rows off the O(users) store. */
  def funnelSummary(spark: SparkSession, tailDir: String): DataFrame =
    readTails(spark, tailDir, Long.MaxValue)
      .groupBy(col("stages_completed"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("stages_completed"))

  /** Wire a streaming (user_id, event_type, ts) source into the loop. */
  def start(events: DataFrame, tailDir: String, checkpointDir: String): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, tailDir, batchId)
      }
      .start()
}
