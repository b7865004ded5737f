package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Dsl._
import graft.tables.Tables

/** Event-sourcing batch semantics (SURVEY.md §2.2 q09, q26, q33) — the
  * reference's CQRS cascade re-expressed as declarative Spark plans.
  */
object Events {

  /** q09: as-of join — for each purchase, the most recent strictly-earlier
    * click by the same user (NULL if none). The purchase→promise causality
    * correlation of consumer/consumer.go:123-144 generalized.
    *
    * Expressed as a per-user equi join with a time residual + max aggregate:
    * both sides shuffle once on user_id, the oracle runs the identical SQL,
    * and semantics at `click.ts == purchase.ts` are pinned (strict <).
    * At 100 TB-scale key skew, the sort-merge as-of (union + window) or a
    * custom SparkStrategy is the upgrade path (SURVEY.md §4.2); at the
    * contract scales the join-agg plan is both correct and fast.
    */
  def q09(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("purchase_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    p.join(c, p("user_id") === c("c_user") && c("c_ts") < p("purchase_ts"), "left_outer")
      .groupBy(col("event_id"), col("user_id"), col("purchase_ts"))
      .agg(max(col("c_ts")).as("click_ts"))
      .orderBy(col("event_id"))
  }

  /** q26: duplicate elimination over the event log — repairs R4's
    * non-idempotent fresh-UUID append (consumer/consumer.go:187): group by
    * the natural key, count copies. */
  def q26(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"), col("event_type"), col("ts"))
      .agg(count(lit(1)).as("n_copies"))
      .orderBy(col("user_id"), col("event_type"), col("ts"))

  /** q33 (flagship): the whole reference cascade as one declarative plan.
    * purchase events (consumer/consumer.go:123) → derived payment promises:
    * due = ts + 30 days (consumer/consumer.go:137), payment_mode fixed to
    * "月まとめ払い" (consumer/consumer.go:138) → monthly consolidated bill per
    * user (the 月まとめ払い mode of producer/events/events.go:18).
    *
    * filter → enrich-select → hash aggregate: one shuffle total, partial
    * aggregation map-side, filter pushed to the scan. */
  def q33(spark: SparkSession, sfDir: String): DataFrame = {
    val due = col("ts") + expr("INTERVAL 30 DAY")
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value"),
        to_date(date_trunc("month", due)).as("bill_month"),
        lit("月まとめ払い").as("payment_mode"))
      .groupBy(col("user_id"), col("bill_month"), col("payment_mode"))
      .agg(count(lit(1)).as("n_purchases"), dsum(col("value")).as("billed_amount"))
      .orderBy(col("user_id"), col("bill_month"))
  }
}
