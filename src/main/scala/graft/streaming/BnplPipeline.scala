package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's full CQRS cascade (SURVEY.md §3) as one Structured
  * Streaming DAG over a checkpointed file source — capabilities s01–s07.
  *
  * Reference topology (consumer/consumer.go): Kinesis poll loop → JSON
  * decode + event_type switch → MySQL event-log append → derived promise
  * events re-published to the same stream → projection tables
  * (payment_promises insert, member_bills insert/update) → WebSocket
  * notify. Here the broker is a directory of JSON files (no Kafka jar
  * ships, SURVEY.md §0), each MySQL table is a parquet projection, and the
  * WebSocket hub is a callback.
  *
  * Delivery semantics are deliberately *stronger* than the reference
  * (at-most-once, iterator Latest, no checkpoint — consumer/consumer.go:64):
  * the file source is checkpointed (replay-safe), the log append dedups by
  * deterministic event_id within the watermark (s06, repairing the fresh-
  * UUID append of consumer/consumer.go:187), and the bill projection is
  * last-writer-wins keyed state (R8).
  *
  * Scale posture: every stage is keyed (user_id / bill_id) — nothing
  * depends on the reference's single-shard global order
  * (producer/producer.go:24); watermarks bound all state. The bill
  * projection DEFAULTS to keyed state (BillProjection.applyTws on the
  * RocksDB provider): per batch only the *changed* bills flow out as a
  * changelog and are merged into the serving parquet — state size is
  * bounded by live keys, merge cost by changed keys. The
  * full-table parquet rewrite (upsertBills) remains as the explicit
  * fallback for environments without a state store.
  *
  * @param billsViaKeyedState true (default) = s04 through
  *   transformWithState/RocksDB; false = per-batch parquet MERGE fallback.
  * @param onUpdate change-notification callback (batchId, userIds) — the
  *   content-free "update" broadcast of consumer/consumer.go:177-180 /
  *   main.go:57-73, upgraded to carry the affected keys (driver-side list
  *   capped at [[BnplPipeline.NotifyUserCap]]; the full set is written to
  *   the notifications directory, never through the driver).
  * @param broker optional non-file broker (r11 verdict item 5 — the
  *   ingest abstraction is NOT file-coupled): a streaming DataFrame in
  *   Envelope schema to ingest INSTEAD of the checkpointed file source,
  *   plus the matching republish for the derived-promise self-loop (the
  *   reference's producer re-post, consumer/consumer.go:142-144). The
  *   poll loop it replaces is source-agnostic too
  *   (consumer/consumer.go:75-96). See [[MemoryBroker]]; a Kafka
  *   deployment would pass readStream.format("kafka")+parse and a
  *   producer-send here (no Kafka jar ships, SURVEY §0). */
class BnplPipeline(
    spark: SparkSession,
    eventsDir: String,
    stateDir: String,
    trigger: Trigger = Trigger.ProcessingTime(0L),
    billsViaKeyedState: Boolean = true,
    onUpdate: (Long, Seq[String]) => Unit = (_, _) => (),
    broker: Option[(DataFrame, DataFrame => Unit)] = None) {

  import Envelope._

  val eventsLogDir = s"$stateDir/events_log"
  val promisesDir = s"$stateDir/payment_promises"
  val billsDir = s"$stateDir/member_bills"
  val notificationsDir = s"$stateDir/notifications"
  private def ckpt(name: String) = s"$stateDir/_checkpoints/$name"

  /** Notifications observed so far (test/UI hook; s07). */
  val notifications = new ConcurrentLinkedQueue[(Long, Seq[String])]()

  private var queries: Seq[StreamingQuery] = Nil

  /** s01: checkpointed micro-batch ingest of the event-file stream —
    * replaces the 1 s Kinesis poll loop (consumer/consumer.go:75-96) —
    * or the injected broker stream (source-agnostic, class doc). */
  private def source: DataFrame =
    broker.map(_._1).getOrElse(
      spark.readStream
        .schema(Envelope.schema)
        .json(eventsDir))

  /** The derived-promise self-loop's publish: back into the event
    * directory (default) or the injected broker. */
  private def republish(batch: DataFrame): Unit =
    broker.map(_._2).getOrElse { (b: DataFrame) =>
      // batch (not streaming-sink) append: no _spark_metadata, so the
      // file source lists the new files like any producer's.
      if (!b.isEmpty) b.write.mode(SaveMode.Append).json(eventsDir)
    }.apply(batch)

  /** s05 + s06: event-time watermark, then exactly-once-per-event_id. */
  private def deduped: DataFrame =
    source
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Start all flows. The returned queries are also retained for stop(). */
  def start(): Seq[StreamingQuery] = {
    val ev = deduped

    // R4/s02: every event — known type or not (consumer/consumer.go:119
    // runs before the switch; no default arm) — lands in the append-only
    // event log, exactly once.
    val logQ = ev.writeStream
      .format("parquet")
      .option("path", eventsLogDir)
      .option("checkpointLocation", ckpt("log"))
      .trigger(trigger)
      .queryName("bnpl_event_log")
      .start()

    // R5/s03: purchases → derived promise events, re-published into the
    // SAME event directory (the reference's self-loop through the broker,
    // consumer/consumer.go:142-144). All derived ids are deterministic
    // functions of the source event so replays stay idempotent; amount is
    // carried through (repairing the hardcoded 3500 of
    // consumer/consumer.go:198). due = event time + 30 days
    // (consumer/consumer.go:137), mode fixed (consumer/consumer.go:138).
    val deriveQ = ev
      .filter(col("event_type") === PurchaseCompleted)
      .select(
        concat(lit("promise:"), col("event_id")).as("event_id"),
        lit(PaymentPromiseCreated).as("event_type"),
        col("ts"),
        col("order_id"),
        col("user_id"),
        col("amount"),
        concat(lit("p-"), col("event_id")).as("promise_id"),
        lit(null).cast("string").as("bill_id"),
        date_format(date_add(to_date(col("ts")), 30), "yyyy-MM-dd").as("due_date"),
        lit(MonthlyMode).as("payment_mode"),
        lit(null).cast("string").as("issued_date"),
        lit(null).cast("string").as("paid_date"))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) => republish(batch) }
      .option("checkpointLocation", ckpt("derive"))
      .trigger(trigger)
      .queryName("bnpl_derive_promises")
      .start()

    // R6: payment_promises projection (insert-only, readme:72-81).
    val promisesQ = ev
      .filter(col("event_type") === PaymentPromiseCreated)
      .select(
        col("promise_id").as("id"),
        col("order_id"), col("user_id"), col("amount"),
        to_date(col("due_date"), "yyyy-MM-dd").as("due_date"),
        col("payment_mode"),
        col("ts").as("created_at"))
      .writeStream
      .format("parquet")
      .option("path", promisesDir)
      .option("checkpointLocation", ckpt("promises"))
      .trigger(trigger)
      .queryName("bnpl_payment_promises")
      .start()

    // R7+R8/s04: member_bills keyed last-writer-wins projection —
    // MemberBillCreated inserts status='unpaid' (consumer/consumer.go:207),
    // PaymentCompleted flips status/paid_date for an EXISTING bill only
    // (UPDATE … WHERE id=?, consumer/consumer.go:214-220 — a no-op when
    // the bill is unknown).
    //
    // Default path: BillProjection.applyTws holds the projection in keyed
    // RocksDB state; each batch emits only the CHANGED bills, merged into
    // the serving parquet by key (O(changed) state work per batch).
    // Fallback path: upsertBills re-merges the whole parquet per batch —
    // O(total state) I/O, kept for state-store-less environments.
    val billsQ = if (billsViaKeyedState) {
      if (!spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
            .exists(_.contains("RocksDB")))
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      import spark.implicits._
      BillProjection.applyTws(ev.as[RawEvent])
        .writeStream
        .outputMode("update")
        .foreachBatch { (changelog: org.apache.spark.sql.Dataset[Bill], batchId: Long) =>
          mergeBillsChangelog(changelog.toDF(), batchId)
        }
        .option("checkpointLocation", ckpt("bills"))
        .trigger(trigger)
        .queryName("bnpl_member_bills")
        .start()
    } else ev
      .filter(col("event_type") === MemberBillCreated ||
              col("event_type") === PaymentCompleted)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        upsertBills(batch, batchId)
      }
      .option("checkpointLocation", ckpt("bills"))
      .trigger(trigger)
      .queryName("bnpl_member_bills")
      .start()

    // R12/s07: change notification per batch with affected users. The full
    // distinct user set is written to the notifications projection — a
    // distributed parquet append that never passes through the driver; the
    // in-process callback carries a BOUNDED sorted sample (the reference's
    // payload is the content-free string "update", main.go:57-73 — keys are
    // a courtesy, not a contract, so capping loses nothing).
    val notifyQ = ev
      .filter(col("event_type") === PaymentCompleted)
      .select(col("user_id"))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // persist: the distinct feeds THREE consumers (emptiness probe,
        // parquet append, capped sample) — without it each one re-executes
        // the batch's distinct shuffle on the 1-second hot path
        val affected = batch.distinct().persist()
        try {
          if (!affected.isEmpty) {
            affected.withColumn("batch_id", lit(batchId))
              .write.mode(SaveMode.Append).parquet(notificationsDir)
            val users = affected.orderBy(col("user_id"))
              .limit(BnplPipeline.NotifyUserCap)
              .collect().map(_.getString(0)).toSeq
            if (users.nonEmpty) {
              notifications.add((batchId, users))
              onUpdate(batchId, users)
            }
          }
        } finally affected.unpersist()
      }
      .option("checkpointLocation", ckpt("notify"))
      .trigger(trigger)
      .queryName("bnpl_notify")
      .start()

    queries = Seq(logQ, deriveQ, promisesQ, billsQ, notifyQ)
    queries
  }

  /** Merge a keyed-state changelog into the serving parquet (s04 default
    * path): each changelog row is already the bill's full post-fold state
    * (BillProjection emits one row per changed key per batch), so the merge
    * is replace-by-key — no window over the full table, no event
    * interpretation here. On a real cluster this is a Delta/Iceberg
    * MERGE keyed on id; the write-aside-and-swap below is the local-FS
    * stand-in. */
  private def mergeBillsChangelog(changelog: DataFrame, batchId: Long): Unit = {
    // persist first: the changelog subtree contains the stateful
    // (RocksDB) execution, and it is referenced three times below
    // (emptiness probe, anti-join key side, union) — unpersisted, every
    // reference would re-run the state store pass within the same batch
    val log = changelog.persist()
    try {
      if (!log.isEmpty) {
        val merged = currentBills
          .join(log.select(col("id")).distinct(), Seq("id"), "left_anti")
          .unionByName(log)
        swapBills(merged, batchId)
      }
    } finally log.unpersist()
  }

  /** Per-batch MERGE into the member_bills parquet (s04 fallback for
    * state-store-less environments). Local-FS stand-in for Delta MERGE:
    * read current, apply the batch's inserts and updates last-writer-wins
    * by (ts, kind), atomically swap directories — O(total state) I/O per
    * batch, which is why the keyed-state path is the default. */
  private def upsertBills(batch: DataFrame, batchId: Long): Unit = {
    import Envelope._
    if (batch.isEmpty) return
    val current = currentBills

    val inserts = batch.filter(col("event_type") === MemberBillCreated)
      .select(
        col("bill_id").as("id"), col("promise_id"), col("user_id"),
        col("amount"),
        lit("unpaid").as("status"),
        to_date(col("issued_date"), "yyyy-MM-dd").as("issued_date"),
        lit(null).cast("date").as("paid_date"),
        col("ts").as("updated_at"))

    val payments = batch.filter(col("event_type") === PaymentCompleted)
      .select(col("bill_id").as("id"),
        to_date(col("paid_date"), "yyyy-MM-dd").as("new_paid_date"),
        col("ts").as("pay_ts"))

    // inserts first (a bill created and paid in the same batch resolves in
    // event order), then payments applied only to known bills.
    val withInserts = current.unionByName(inserts)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("id")).orderBy(col("updated_at").desc)))
      .filter(col("rn") === 1).drop("rn")

    val merged = withInserts.as("b")
      .join(payments.as("p"), col("b.id") === col("p.id"), "left_outer")
      .select(col("b.id"), col("b.promise_id"), col("b.user_id"), col("b.amount"),
        when(col("p.new_paid_date").isNotNull, lit("paid"))
          .otherwise(col("b.status")).as("status"),
        col("b.issued_date"),
        coalesce(col("p.new_paid_date"), col("b.paid_date")).as("paid_date"),
        coalesce(col("p.pay_ts"), col("b.updated_at")).as("updated_at"))

    swapBills(merged, batchId)
  }

  private def currentBills: DataFrame = {
    val fs = new java.io.File(billsDir)
    if (fs.exists() && fs.listFiles() != null && fs.listFiles().nonEmpty)
      spark.read.parquet(billsDir)
    else emptyBills
  }

  /** Atomic-enough projection swap on local FS: write aside, then move
    * into place (the seam a Delta/Iceberg writer replaces). */
  private def swapBills(merged: DataFrame, batchId: Long): Unit = {
    val tmp = s"$billsDir.tmp-$batchId"
    merged.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val target = new java.io.File(billsDir)
    if (target.exists()) {
      target.listFiles().foreach(_.delete()); target.delete()
    }
    new java.io.File(tmp).renameTo(target)
  }

  private def emptyBills: DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "id string, promise_id string, user_id string, amount bigint, " +
        "status string, issued_date date, paid_date date, updated_at timestamp"))

  /** Drain the self-loop to quiescence: derived promise events written in
    * round N are consumed in round N+1 (two broker hops in the reference,
    * SURVEY.md §3.1 stages 3-9). */
  def drain(rounds: Int = 3): Unit =
    (1 to rounds).foreach(_ => queries.foreach(_.processAllAvailable()))

  def stop(): Unit = queries.foreach(_.stop())

  // ---- read path (R9/R10, main.go:213-270) ----

  /** Point query: promises by user — filter + projection, pushdown native. */
  def paymentPromises(userId: String): DataFrame =
    spark.read.parquet(promisesDir)
      .filter(col("user_id") === userId)
      .select(col("order_id"), col("amount"), col("due_date"),
        col("payment_mode"), col("created_at"))
      .orderBy(col("created_at"))

  /** Point query: bills by user; paid_date NULL until paid (readme:91). */
  def memberBills(userId: String): DataFrame =
    spark.read.parquet(billsDir)
      .filter(col("user_id") === userId)
      .select(col("id"), col("amount"), col("status"),
        col("issued_date"), col("paid_date"))
      .orderBy(col("id"))

  /** The event log (R4 read side). */
  def eventsLog: DataFrame = spark.read.parquet(eventsLogDir)
}

object BnplPipeline {
  /** Driver-side bound on the per-batch user list handed to the
    * notification callback. The complete affected-key set lives in the
    * notifications parquet; collecting an unbounded distinct() per
    * micro-batch is the one driver-side materialization a 100 TB stream
    * can't afford. */
  val NotifyUserCap = 100
}
