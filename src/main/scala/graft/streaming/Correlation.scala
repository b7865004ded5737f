package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** s08: stream-stream interval join — the streaming counterpart of the
  * batch as-of correlation (q09): every purchase joined to the same user's
  * clicks from the preceding hour.
  *
  * Both sides carry a watermark, and the join has a time-range predicate,
  * so Spark bounds the buffered state on each side: clicks older than
  * (watermark − 1 hour) are evicted, purchases leave state as soon as the
  * click watermark passes them. At 100 TB the state size is therefore
  * O(events within the interval), not O(stream) — the property a naive
  * unbounded self-join lacks. Works on one source (self-join of two
  * filtered flows), mirroring the reference's single event stream.
  */
object Correlation {

  def purchaseClickJoin(events: DataFrame): DataFrame =
    joined(events, "inner")

  /** s08 left-outer form: purchases with NO click in the preceding hour
    * still emit — with a NULL click_ts — once the click-side watermark
    * passes the point where a matching click can no longer arrive
    * (watermark ≥ purchase_ts, derived by Spark from the range condition).
    * The streaming counterpart of q09's NULL-when-no-click semantics;
    * state stays bounded exactly as in the inner form. */
  def purchaseClickLeftJoin(events: DataFrame): DataFrame =
    joined(events, "leftOuter")

  private def joined(events: DataFrame, joinType: String): DataFrame = {
    val purchases = events
      .filter(col("event_type") === Envelope.PurchaseCompleted)
      .select(col("event_id"), col("user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "10 minutes")
    val clicks = events
      .filter(col("event_type") === "ClickEvent")
      .select(col("user_id").as("click_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "10 minutes")
    purchases.join(
      clicks,
      expr("""user_id = click_user AND
             |click_ts >= purchase_ts - INTERVAL 1 HOUR AND
             |click_ts < purchase_ts""".stripMargin),
      joinType)
      .select(col("event_id"), col("user_id"), col("purchase_ts"), col("click_ts"))
  }
}
