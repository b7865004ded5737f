package graft

import org.apache.spark.sql.SparkSession

/** Codegen-cache working-set probe (r13 verdict item 2: q85 tripled
  * 0.27→0.89 s on byte-unchanged code when the suite grew to 145 queries
  * × 3 interleaved passes; the suspect is the generated-class cache —
  * sized 2000 in r12 — evicting q85's 16 fused DotProductFold kernels
  * between passes, forcing a Janino recompile + cold JIT every pass).
  *
  * Measures the suspicion directly instead of guessing: runs the full
  * declared suite for two interleaved passes (the Bench shape, noop sink,
  * same cache hygiene) and reads the cumulative Janino compilation count
  * (CodegenMetrics — compile() only runs on a cache MISS) after each
  * pass, plus a handful of sentinel query timings per pass. With the
  * cache holding the working set, pass 2 adds ~zero compilations; every
  * pass-2 compilation is an eviction. Run once per cache size via the
  * SPARK_GRAFT_CODEGEN_CACHE seam (the conf is builder-static — one
  * process per size):
  *
  *   SPARK_GRAFT_CODEGEN_CACHE=2000 tools/run_jvm.sh graft.CodegenProbe
  *   SPARK_GRAFT_CODEGEN_CACHE=4000 tools/run_jvm.sh graft.CodegenProbe
  *
  * Diagnostic only — not part of the declared surface.
  */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_CODEGEN_PASSES", "2").toInt
    val sentinels = Set("q85_random_projection", "q135_distribution_drift",
      "q99_dedup_eval", "q36_ngram_jaccard")

    val spark = SparkEntry.applyStaticEngineConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkEntry.applyEngineConfs(spark)
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    val cacheSize = spark.conf.get("spark.sql.codegen.cache.maxEntries")

    import org.apache.spark.metrics.source.CodegenMetrics
    def compilations: Long = CodegenMetrics.METRIC_COMPILATION_TIME.getCount

    val ordered = SparkEntry.queries.toSeq
    var prev = compilations
    for (p <- 1 to passes) {
      val t0 = System.nanoTime()
      for ((name, fn) <- ordered) {
        val tq = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[codegen] $name failed: ${e.getMessage}") }
        finally SparkEntry.clearGraftCaches(spark)
        if (sentinels(name))
          println(f"[codegen] cache=$cacheSize pass$p $name%-28s ${(System.nanoTime() - tq) / 1e9}%6.2f s")
      }
      val now = compilations
      println(f"[codegen] cache=$cacheSize pass$p compilations=${now - prev} " +
        f"(cumulative $now) suite ${(System.nanoTime() - t0) / 1e9}%.1f s")
      prev = now
    }
    spark.stop()
  }
}
