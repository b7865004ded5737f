package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types.StructType

/** The event envelope on the wire (JSON lines), modeled on the reference's
  * four event structs (producer/events/events.go:4-38) and its JSON wire
  * format (producer/producer.go:16), flattened into one nullable schema —
  * the reference's schema-on-read two-phase decode
  * (consumer/consumer.go:112-119) becomes a single typed `from_json` with
  * unknown fields null.
  *
  * Two deliberate upgrades over the reference, both SURVEY.md §2.1 repairs:
  *  - `event_id` is part of the envelope and derived deterministically by
  *    producers, so replays dedup (the reference mints a fresh UUID per
  *    delivery, consumer/consumer.go:187 — non-idempotent).
  *  - `ts` is explicit event time (the reference relies on DB-side
  *    CURRENT_TIMESTAMP, readme:69).
  */
case class RawEvent(
    event_id: String,
    event_type: String,
    ts: java.sql.Timestamp,
    order_id: String,
    user_id: String,
    amount: java.lang.Long,
    promise_id: String,
    bill_id: String,
    due_date: String,     // "yyyy-MM-dd" (Go layout 2006-01-02, main.go:119)
    payment_mode: String,
    issued_date: String,
    paid_date: String)

object Envelope {
  /** Event-type discriminators (producer/events/events.go). */
  val PurchaseCompleted = "PurchaseCompletedEvent"
  val PaymentPromiseCreated = "PaymentPromiseCreatedEvent"
  val MemberBillCreated = "MemberBillCreatedEvent"
  val PaymentCompleted = "PaymentCompletedEvent"

  /** Fixed payment mode of derived promises (consumer/consumer.go:138). */
  val MonthlyMode = "月まとめ払い"

  val schema: StructType = Encoders.product[RawEvent].schema
}
