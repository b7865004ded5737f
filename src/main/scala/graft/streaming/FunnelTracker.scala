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
  *
  * The arrival-order contract is ENFORCED, not assumed (r9/r10 verdict
  * item 2): the store keeps one row per user EVER SEEN (funnel-entered
  * or not — a user whose first events precede their signup has
  * discardable events but a mark that must still advance), carrying the
  * user's max event ts as `hwm_ts`, and [[processBatch]] rejects —
  * IllegalStateException, before any sink write — a batch carrying an
  * event strictly below a seen user's mark. NONDECREASING is the precise
  * contract (not strictly increasing): the fold is tie-safe because
  * every stage filter is strict (`ts > t_prev`), so an event tying the
  * mark can neither qualify retroactively nor lower a stage minimum —
  * the s25 out-of-order law pins both directions. Replay stays legal:
  * a re-run of batch b checks against the marks as of b-1 (its own
  * writes invisible), exactly like its reads.
  */
object FunnelTracker {

  private def emptyTails(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("user_id"),
      lit(null).cast("timestamp").as("t_signup"),
      lit(null).cast("timestamp").as("t_view"),
      lit(null).cast("timestamp").as("t_click"),
      lit(null).cast("timestamp").as("t_purchase"),
      lit(0).as("stages_completed"),
      lit(null).cast("timestamp").as("hwm_ts"))

  /** One row per user ever seen — funnel tuple (NULL t_signup if the
    * user never entered) plus the order mark: highest-batch_id tail row
    * below `batchId`. Schema-stable empty frame before any write. */
  private[graft] def readTailsFull(spark: SparkSession, tailDir: String,
      batchId: Long): DataFrame = {
    if (!StoreRead.hasParquetData(spark, tailDir)) return emptyTails(spark)
    val w = Window.partitionBy(col("user_id")).orderBy(col("batch_id").desc)
    spark.read.parquet(tailDir)
      .filter(col("batch_id") < batchId) // replay: never see own tails
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("t_signup"), col("t_view"),
        col("t_click"), col("t_purchase"), col("stages_completed"),
        col("hwm_ts"))
  }

  /** Live funnel tuple per funnel-ENTERED user — the read-path face
    * (q62's row set: hwm-only rows are store bookkeeping, not funnel
    * state). */
  private[graft] def readTails(spark: SparkSession, tailDir: String,
      batchId: Long): DataFrame =
    readTailsFull(spark, tailDir, batchId)
      .filter(col("t_signup").isNotNull)
      .select(col("user_id"), col("t_signup"), col("t_view"),
        col("t_click"), col("t_purchase"), col("stages_completed"))

  /** One micro-batch of (user_id, event_type, ts): advance the touched
    * users' funnels, write the new tails to the batch's own partition. */
  def processBatch(batch: DataFrame, tailDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    // bound the LWW read: fold committed tail partitions into the base
    // every TailCompactEvery batches (top-of-batch, so a replay of THIS
    // batch reads the base = state through batchId − 1, unchanged)
    if (batchId > 0 && batchId % StoreRead.TailCompactEvery == 0)
      StoreRead.compactLww(spark, tailDir, Seq("user_id"), batchId)
    val ev = batch.select(col("user_id"), col("event_type"), col("ts"))
    // only the batch's users can advance; everyone else's tail stays
    // live in an older partition untouched. NULL-safe semi join: the
    // null-user group carries a tail like any key (it enters the funnel
    // at signup and strands there — the kernel's own semantics).
    val stored = readTailsFull(spark, tailDir, batchId)
    val batchUsers = ev.select(col("user_id").as("bu")).distinct()
    // no pin despite two consumers (gate + synth): the frame is a
    // join-rooted plan (checkpointing those poisons captured constraints
    // for the later union — the r8 UnionBase.rewriteConstraints find)
    // and the LWW window over an O(users) store is cheap to run twice
    val tails = stored
      .join(batchUsers, stored("user_id") <=> batchUsers("bu"), "left_semi")
    // arrival-order gate: every batch event must sit at or above the
    // touched user's stored hwm_ts — checked BEFORE any sink write so a
    // violating batch leaves the store untouched (nondecreasing, not
    // strict: the fold is tie-safe — see the class doc)
    val bad = ev.groupBy(col("user_id")).agg(min(col("ts")).as("mn"))
      .join(tails.select(col("user_id").as("hu"), col("hwm_ts")),
        col("user_id") <=> col("hu"))
      .filter(col("mn") < col("hwm_ts"))
      .select(col("user_id"), col("mn"), col("hwm_ts"))
      .limit(3).collect()
    if (bad.nonEmpty) throw new IllegalStateException(
      s"s25 arrival-order contract violated in batch $batchId (a late " +
        "event could qualify discarded history; q62 parity would " +
        "silently break): " +
        bad.map(r => s"user ${r.get(0)}: batch min ts ${r.get(1)} < high-water ${r.get(2)}")
          .mkString("; "))
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
    // new tail = EVERY batch user: funnel tuple where entered (NULL
    // stages otherwise) + the advanced order mark — the gate above
    // proved this batch's max ts is each touched user's new high water
    val hwNew = ev.groupBy(col("user_id").as("hu"))
      .agg(max(col("ts")).as("hwm_ts"))
    hwNew.join(state, col("hu") <=> state("user_id"), "left")
      .select(col("hu").as("user_id"), col("t_signup"), col("t_view"),
        col("t_click"), col("t_purchase"),
        coalesce(col("stages_completed"), lit(0)).as("stages_completed"),
        col("hwm_ts"))
      .withColumn("batch_id", lit(batchId))
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
