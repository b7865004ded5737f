package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Dsl._
import graft.tables.Tables

/** Vector-similarity operators over `embeddings` (SURVEY.md §2.2 q31 +
  * north-star similarity q37). Cosine is computed in DOUBLE by codegen'd
  * higher-order functions (Dsl.cosine) — no UDF, no MLlib dependency.
  *
  * Scale posture: q31 broadcasts the single query vector (generalizes to a
  * broadcast codebook / centroid set — never a shuffled cartesian); q37
  * blocks the pairwise join on `label` so the quadratic term is bounded per
  * block (the same blocking an IVF cell assignment provides, see
  * graft.ops.Ann for the LSH/IVF candidate generators).
  */
object Vectors {

  /** q31: brute-force cosine top-k against one query vector (vec_id = 0),
    * the exact baseline every ANN variant is judged against. */
  def q31(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val query = emb.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    emb.join(broadcast(query))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), round4(cosine(col("embedding"), col("qvec"))).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
  }

  /** q38: approximate-nearest-neighbor via multi-table random-hyperplane
    * LSH (graft.ops.Ann, 8 tables × 4 sign bits): a vector is a candidate
    * iff it shares any table's bucket with the query vector; candidates are
    * ranked by exact cosine. The scale path of q31 — per query the cost is
    * L bucket lookups (broadcast of one query row + hash filter), not a
    * scan, and recall vs the exact q31 top-k is asserted in LlmOpsSpec. */
  def q38(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
      .withColumn("buckets", graft.ops.Ann.buckets(col("embedding")))
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qvec"), col("buckets").as("qbuckets"))
    emb.join(broadcast(query))
      .filter(col("vec_id") =!= 0 &&
        exists(zip_with(col("buckets"), col("qbuckets"), (a, b) => a === b), x => x))
      .select(col("vec_id"), round4(cosine(col("embedding"), col("qvec"))).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
  }

  /** q37: embedding-cosine near-duplicate pairs, blocked by label; top 20
    * most-similar pairs (the testdata plants no true near-dups — max
    * same-label cosine ≈ 0.45 — so the operator surfaces the closest pairs
    * rather than thresholding to an empty set). */
  def q37(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val a = e.select(col("label"), col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = e.select(col("label"), col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    a.join(b, Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("label"), col("vec_a"), col("vec_b"),
        round4(cosine(col("emb_a"), col("emb_b"))).as("sim"))
      .orderBy(col("sim").desc, col("vec_a"), col("vec_b"))
      .limit(20)
  }
}
