package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** s11: stream-static enrichment — each micro-batch of the event stream
  * left-joins a static reference table (member segments here; at scale, any
  * slowly-changing dimension), completing the join-family coverage next to
  * the batch zoo (q03–q09) and the stream-stream interval join (s08).
  *
  * Scale posture: the static side is broadcast — no stream-side shuffle, no
  * state store (unlike s08 there is nothing to watermark: the static side
  * never grows stale state). Honesty note: a static DataFrame is resolved
  * once at query start; a dimension that CHANGES mid-flight needs the
  * query restarted (or a Delta-style source that re-lists per batch) — the
  * standard Structured Streaming contract for stream-static joins.
  */
object Enrichment {

  /** Left-enrich a (streaming or batch) event frame with a static dim on
    * user_id; unmatched users keep NULL dim columns (same NULL semantics
    * the q05 left-outer oracle pins). */
  def enrich(stream: DataFrame, dim: DataFrame): DataFrame =
    stream.join(broadcast(dim), Seq("user_id"), "left")
}
