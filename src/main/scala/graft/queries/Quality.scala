package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Data-quality / constraint auditing (SURVEY.md §2.2 q109) — the
  * validation panel every warehouse runs on ingest: referential
  * integrity, domain constraints, null screens, and schema-drift counts,
  * each as one named check with its violation count. The synthetic
  * corpus is clean (all counts 0 at the tested scale factors), so
  * SemanticsSpec pins the checks on PLANTED violations — the same
  * vacuity discipline as q29's exact-dup groups.
  */
object Quality {

  /** The known event-type domain (FIXTURES.md). */
  val EventTypes: Seq[String] = Seq("click", "purchase", "error", "signup", "view")

  /** q109: the constraint audit over the driver's tables. Output: one row
    * per check, (check_name, n_violations), ordered by check name.
    *
    * Scale posture: every check is either a scan + mergeable aggregate
    * (domain/null screens — all five single-table checks fuse into their
    * scans) or a left-anti equi-join against a key table (referential
    * integrity — the dim side broadcasts when small, shuffles keyed
    * otherwise; the count aggregates map-side). The union is of
    * single-row frames, so the final ordering is free. */
  def q109(spark: SparkSession, sfDir: String): DataFrame =
    dqAudit(
      Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir),
      Tables.customer(spark, sfDir), Tables.nation(spark, sfDir),
      Tables.events(spark, sfDir), Tables.documents(spark, sfDir),
      Tables.embeddings(spark, sfDir))

  /** q109 core on arbitrary frames, so SemanticsSpec can plant
    * violations. */
  private[graft] def dqAudit(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, nation: DataFrame, events: DataFrame,
      documents: DataFrame, embeddings: DataFrame): DataFrame = {
    def check(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_violations"))
    val dimRef = embeddings.agg(max(size(col("embedding"))).as("_d"))
    Seq(
      check("customer_orphans",
        customer.join(nation,
          customer("c_nationkey") === nation("n_nationkey"), "left_anti")),
      check("documents_empty_text",
        documents.filter(col("n_chars") <= 0 || length(col("text")) === 0)),
      check("embeddings_dim_drift",
        embeddings.crossJoin(broadcast(dimRef))
          .filter(size(col("embedding")) =!= col("_d"))),
      check("events_null_user", events.filter(col("user_id").isNull)),
      check("events_unknown_type",
        events.filter(!col("event_type").isin(EventTypes: _*))),
      check("lineitem_discount_range",
        lineitem.filter(col("l_discount") < 0 || col("l_discount") > 1)),
      check("lineitem_nonpositive_qty", lineitem.filter(col("l_quantity") <= 0)),
      check("lineitem_orphans",
        lineitem.join(orders,
          lineitem("l_orderkey") === orders("o_orderkey"), "left_anti")),
      check("orders_nonpositive_total", orders.filter(col("o_totalprice") <= 0)),
      check("orders_orphans",
        orders.join(customer,
          orders("o_custkey") === customer("c_custkey"), "left_anti")))
      .reduce(_.unionByName(_))
      .orderBy(col("check_name"))
  }
}
