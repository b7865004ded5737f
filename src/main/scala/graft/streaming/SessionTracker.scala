package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.{Windows => WindowsQ}

/** s49: streaming SESSION tracking — q178's entry→exit flow maintained as
  * events land, the continuously-sessionizing job every event platform
  * runs (a session is open until time proves it closed, so state is
  * intrinsic). ORDER-GATED family (s23/s24/s31/s35): sessionization is
  * order-sensitive across batches — a late event could bridge two
  * already-split sessions — so each user's events must arrive in
  * (ts, event_id) order across batches, enforced at the boundary BEFORE
  * any write.
  *
  * The batch seam is the interesting part: a session can SPAN batches.
  * Each batch sessionizes its own events through q178's OWN
  * `Windows.sessionize` kernel, then merges the resulting session
  * partials with the user's stored OPEN session by the same gap rule the
  * kernel uses (two adjacent sessions merge iff the gap between the
  * previous last event and the next first event is ≤ 30 minutes — the
  * exactly-30 boundary merges, q25's law): min/max over the carrier
  * structs and a count sum reconstruct the merged session exactly.
  * Every merged session except the user's LAST is provably closed (the
  * next session's first event is > 30 min later) and appends to the
  * closed log; the last stays open in the state store.
  *
  * Store layout: `openDir` = per-user open session, LWW by batch_id
  * (doubles as the order high-water mark via its `last` struct);
  * `closedDir` = closed sessions in the batch's own partition. Replay of
  * batch b reads only batch_id < b and dynamic-overwrites both of its
  * partitions byte-identically.
  *
  * Read: [[flow]] = q178's `Windows.flowOf` finisher over closed ∪ open —
  * row-for-row equal to batch q178 on the log so far, INCLUDING the
  * still-open sessions (exactly what batch q178 sees at the same
  * horizon).
  *
  * Scale posture: per batch one session_window aggregate of the batch
  * only, one window over the touched users' ≤ (sessions-per-batch + 1)
  * segments, two bounded writes — O(batch + touched users), never
  * history. The read merges O(sessions) rows into the ≤ |types|² report.
  */
object SessionTracker {

  private val GapMicros = 30L * 60 * 1000000

  private def emptyOpen(spark: SparkSession): DataFrame =
    WindowsQ.sessionize(spark.range(0).select(col("id").as("user_id"),
      lit(null).cast("timestamp").as("ts"), col("id").as("event_id"),
      lit("").as("event_type")))

  /** Per-user open session: highest-batch_id state row below `batchId`. */
  private def readOpen(spark: SparkSession, openDir: String,
      batchId: Long): DataFrame = {
    if (!StoreRead.hasParquetData(spark, openDir)) return emptyOpen(spark)
    val w = Window.partitionBy(col("user_id")).orderBy(col("batch_id").desc)
    spark.read.parquet(openDir)
      .filter(col("batch_id") < batchId) // replay: never see own state
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("first"), col("last"), col("n_events"))
  }

  /** One micro-batch of (user_id, event_id, event_type, ts): merge its
    * sessions with the open state, close what time has closed, advance
    * the state. */
  def processBatch(batch: DataFrame, openDir: String, closedDir: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    if (batchId > 0 && batchId % StoreRead.TailCompactEvery == 0)
      StoreRead.compactLww(spark, openDir, Seq("user_id"), batchId)
    val ev = batch.select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
    val stored = readOpen(spark, openDir, batchId)
    val batchUsers = ev.select(col("user_id").as("bu")).distinct()
    val storedTouched = stored
      .join(batchUsers, stored("user_id") <=> col("bu"), "left_semi")
    // arrival-order gate (s35's argument): every batch event must sit
    // strictly above the touched user's open session's last event — a
    // late event could bridge sessions the kernel already split
    val bad = ev.groupBy(col("user_id"))
      .agg(min(struct(col("ts"), col("event_id"))).as("mn"))
      .join(storedTouched.select(col("user_id").as("hu"),
          struct(col("last.ts"), col("last.event_id")).as("hw")),
        col("user_id") <=> col("hu"))
      .filter(col("mn") <= col("hw"))
      .limit(3).collect()
    if (bad.nonEmpty) throw new IllegalStateException(
      s"s49 arrival-order contract violated in batch $batchId " +
        "(sessionization is order-sensitive; a late event could bridge " +
        "already-split sessions): " +
        bad.map(r => s"user ${r.get(0)}").mkString("; "))
    // q178's own kernel over the batch, then the seam merge: segments
    // (open state ∪ batch sessions) chain together wherever the gap
    // between last and next-first events is within the session gap
    val segs = storedTouched.unionByName(WindowsQ.sessionize(ev))
    val wU = Window.partitionBy(col("user_id")).orderBy(col("first.ts"), col("first.event_id"))
    val merged = segs
      .withColumn("prev_last", lag(col("last"), 1).over(wU))
      .withColumn("new_s",
        when(col("prev_last").isNull ||
          unix_micros(col("first.ts")) - unix_micros(col("prev_last.ts")) > GapMicros,
          1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(
        wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("first")).as("first"), max(col("last")).as("last"),
        sum(col("n_events")).as("n_events"))
    val ranked = merged.withColumn("rn",
      row_number().over(Window.partitionBy(col("user_id")).orderBy(col("sid").desc)))
      .localCheckpoint(true) // one evaluation feeds both writes
    ranked.filter(col("rn") > 1)
      .select(col("user_id"), col("first"), col("last"), col("n_events"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(closedDir)
    ranked.filter(col("rn") === 1)
      .select(col("user_id"), col("first"), col("last"), col("n_events"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(openDir)
  }

  /** The q178-shaped flow report over everything ingested so far —
    * closed sessions plus the currently-open ones, exactly the horizon
    * batch q178 sees. */
  def flow(spark: SparkSession, openDir: String, closedDir: String): DataFrame = {
    val closed =
      if (!StoreRead.hasParquetData(spark, closedDir)) emptyOpen(spark)
      else spark.read.parquet(closedDir)
        .select(col("user_id"), col("first"), col("last"), col("n_events"))
    val open = readOpen(spark, openDir, Long.MaxValue)
    WindowsQ.flowOf(closed.unionByName(open))
  }

  /** Wire a streaming (user_id, event_id, event_type, ts) source in. */
  def start(events: DataFrame, openDir: String, closedDir: String,
      checkpointDir: String): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, openDir, closedDir, batchId)
      }
      .start()
}
