package graft

import org.apache.spark.sql.functions._

/** Degenerate-input law sweep (judge r8 item 2): every registered query
  * must be total on the two inputs that break naive operators — EMPTY
  * tables and SINGLE-ROW tables — because at 100 TB a per-source /
  * per-partition slice being empty is not an edge case, it is Tuesday.
  *
  * Fixtures derive from the live sf0.001 schemas (limit 0 / min-key
  * limit 1), so a driver-side schema vintage change flows into this
  * sweep automatically — the sweep IS the regression net for the next
  * regeneration. The engine==oracle half of the law runs OUTSIDE sbt
  * (DuckDB is driver-side only): `tools/make_degenerate.py` writes the
  * same fixtures to disk and the exit ritual runs graft.Verify +
  * tools/check.py on them — this spec pins the no-crash half plus
  * schema stability across the two fixtures (a query's output columns
  * must not depend on how populated the input is, or the oracle compare
  * would break on shape before values). */
class DegenerateSpec extends SparkSpec {

  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val keyOf = Map(
    "region" -> "r_regionkey", "nation" -> "n_nationkey",
    "customer" -> "c_custkey", "supplier" -> "s_suppkey",
    "part" -> "p_partkey", "orders" -> "o_orderkey",
    "lineitem" -> "l_orderkey", "events" -> "event_id",
    "documents" -> "doc_id", "embeddings" -> "vec_id")

  private def makeFixture(dst: String, rows: Int): Unit =
    tables.foreach { t =>
      val src = spark.read.parquet(s"$sf001/$t.parquet")
      val cut = if (rows == 0) src.limit(0)
      else src.orderBy(col(keyOf(t))).limit(rows)
      cut.coalesce(1).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }

  private lazy val emptyDir = { val d = tmpDir("degen-empty"); makeFixture(d, 0); d }
  private lazy val oneDir = { val d = tmpDir("degen-one"); makeFixture(d, 1); d }

  /** Run every query against `dir`; return name → output columns for the
    * cross-fixture schema-stability check. Failures accumulate so one
    * report shows the whole degenerate surface, not the first crash. */
  private def sweep(dir: String, label: String): Map[String, Seq[String]] = {
    val out = scala.collection.mutable.Map.empty[String, Seq[String]]
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        df.collect() // force full evaluation, not just planning
        out(name) = df.columns.toSeq
        None
      } catch {
        case e: Throwable => Some(s"$name/$label: ${e.getClass.getSimpleName} ${e.getMessage}")
      } finally SparkEntry.clearGraftCaches(spark)
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    out.toMap
  }

  test("every query is total on EMPTY and SINGLE-ROW tables, with fixture-independent schemas") {
    val emptySchemas = sweep(emptyDir, "empty")
    val oneSchemas = sweep(oneDir, "one-row")
    assert(emptySchemas.keySet == oneSchemas.keySet)
    val drift = emptySchemas.keys.filter(n => emptySchemas(n) != oneSchemas(n))
    assert(drift.isEmpty, s"schema depends on input population: ${drift.mkString(", ")}")
  }
}
