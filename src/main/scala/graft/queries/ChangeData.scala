package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Change-data capture over the event log's LWW read model — the
  * table-diff every lakehouse ships as a first-class read (Delta CDF /
  * Iceberg changelog): which rows of the q27 projection were INSERTED or
  * UPDATED between two snapshots, with pre- and post-images. The
  * reference materializes only the CURRENT projection row
  * (consumer/consumer.go:214-220, an UPSERT that destroys the previous
  * image); the moment a downstream consumer asks "what changed since I
  * last read?" this diff is the query — and its incremental twin (s34,
  * graft.streaming.ChangeFeed) emits the same rows as the events land.
  *
  * One definition of "a change" for both faces: [[cdcRows]] builds the
  * change rows from (user_id, old, nw) image pairs; q152 feeds it the
  * two-snapshot aggregate, s34 feeds it its store-vs-batch join — so the
  * batch diff and the streamed feed cannot drift on the change predicate
  * or the row shape.
  */
object ChangeData {

  /** Snapshot-1 cutoff: the archived state the diff is taken against.
    * Early in the stream so the diff exercises BOTH branches (users first
    * seen after the cutoff → insert; users whose latest event moved →
    * update) at every shipped sf. Snapshot 2 is the full log (the
    * "current" table). */
  val SnapshotCutoff = "2024-01-01 12:00:00"

  /** LWW image struct, ordered so `max` IS the q27 winner: lexicographic
    * (ts, event_id) — event_id breaks ts ties exactly like q27's window.
    * The payload fields (event_type, value) ride behind the unique
    * event_id and never participate in the ordering. */
  private def image: Column =
    struct(col("ts"), col("event_id"), col("event_type"), col("value"))

  /** The shared change-row constructor: input has `user_id`, a nullable
    * `old` image and a non-null `nw` image; output is one CDC row per
    * CHANGED key — `insert` (no old image) or `update` (the LWW winner
    * moved, detected by event_id: the log is append-only, so a state can
    * advance but never revert), with both images flattened. A key whose
    * winner did not move emits nothing. */
  private[graft] def cdcRows(pairs: DataFrame): DataFrame =
    pairs
      .filter(col("old").isNull || col("old.event_id") =!= col("nw.event_id"))
      .select(col("user_id"),
        when(col("old").isNull, "insert").otherwise("update").as("change"),
        col("old.event_id").as("old_event_id"),
        col("old.event_type").as("old_event_type"),
        col("old.value").as("old_value"),
        col("old.ts").as("old_ts"),
        col("nw.event_id").as("new_event_id"),
        col("nw.event_type").as("new_event_type"),
        col("nw.value").as("new_value"),
        col("nw.ts").as("new_ts"))

  /** q152: the CDC diff between the LWW projection at [[SnapshotCutoff]]
    * and at the end of the log.
    *
    * Scale posture: ONE map-side-combined shuffle on user_id — both
    * snapshots come out of the same grouped pass as two conditional
    * `max(struct)` aggregates (the T1 image maxes only rows at or below
    * the cutoff), so the diff never runs a window over raw events and
    * never scans the log twice. At 100 TB this is exactly a q27-cost
    * aggregation; output is bounded by the CHANGED key count. */
  def q152(spark: SparkSession, sfDir: String): DataFrame =
    snapshotDiff(Tables.events(spark, sfDir), SnapshotCutoff)

  /** q152 kernel on an arbitrary event frame (planted-data seam). */
  private[graft] def snapshotDiff(ev: DataFrame, cutoff: String): DataFrame = {
    val t1 = lit(cutoff).cast("timestamp")
    cdcRows(
      ev.groupBy(col("user_id"))
        .agg(max(when(col("ts") <= t1, image)).as("old"),
             max(image).as("nw")))
      .orderBy(col("user_id"))
  }
}
