package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Dsl._
import graft.tables.Tables

/** Deterministic sampling / split operators over `documents` — the
  * dataset-assignment stage of a training-data pipeline (round-3 surface
  * growth, SURVEY.md §2.2 q51/q52).
  *
  * Both are built on the shared 60-bit content hash (Dsl.h60, mirrored
  * constant-for-constant in OracleSql), NOT on rand(): assignment is a pure
  * function of the row key, so it is reproducible across runs, engines, and
  * cluster sizes, and a re-run after appending new documents never moves an
  * existing document between splits — the property that keeps train/test
  * contamination out when the corpus grows. Salted per operator
  * ("split:" / "strat:") so the two assignments are independent.
  *
  * Scale posture: q51 is one map-side hash + a 3-group aggregate (no
  * shuffle beyond the partial/final agg); q52 is one window per language —
  * a single shuffle on the stratum key, top-k within each partition.
  */
object Sampling {

  /** q51: train/val/test split (80/10/10) by hash bucket of the doc key.
    * Audit-style output: per-split document count and char volume. */
  def q51(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = h60(concat(lit("split:"), col("doc_id").cast("string"))) % 100
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"),
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
          .as("split"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("split"))
  }

  /** q52: balanced stratified sample — exactly k documents per language,
    * chosen by hash order (a deterministic per-stratum reservoir): the
    * class-balancing subsample in front of training. Hash ties broken by
    * doc_id so the selection is a total order. */
  val StratumK = 20

  def q52(spark: SparkSession, sfDir: String): DataFrame = {
    val hk = h60(concat(lit("strat:"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("lang")).orderBy(col("hk"), col("doc_id"))
    Tables.documents(spark, sfDir)
      .select(col("lang"), col("doc_id"), hk.as("hk"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= StratumK)
      .select(col("lang"), col("doc_id"), col("rk"))
      .orderBy(col("lang"), col("rk"))
  }
}
