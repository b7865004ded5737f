package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Set operations over event-actor sets (SURVEY.md §2.2 q15–q17).
  * UNION/INTERSECT/EXCEPT all carry DISTINCT semantics, matching the SQL
  * set operators the oracle runs. */
object SetOps {

  private def users(spark: SparkSession, sfDir: String, t: String): DataFrame =
    Tables.events(spark, sfDir).filter(col("event_type") === t).select(col("user_id"))

  /** q15: users who clicked OR purchased (UNION DISTINCT). */
  def q15(spark: SparkSession, sfDir: String): DataFrame =
    users(spark, sfDir, "click").union(users(spark, sfDir, "purchase"))
      .distinct()
      .orderBy(col("user_id"))

  /** q16: users who clicked AND purchased (INTERSECT). */
  def q16(spark: SparkSession, sfDir: String): DataFrame =
    users(spark, sfDir, "click").intersect(users(spark, sfDir, "purchase"))
      .orderBy(col("user_id"))

  /** q17: users who clicked but never purchased (EXCEPT). */
  def q17(spark: SparkSession, sfDir: String): DataFrame =
    users(spark, sfDir, "click").except(users(spark, sfDir, "purchase"))
      .orderBy(col("user_id"))
}
