package graft
import org.apache.spark.sql.SparkSession

/** Builder inner-loop profiler (not part of the driver contract): times each
  * named query three times (cold/warm/warm2), clearing the Spark cache
  * between iterations so warm runs measure execution with plan+codegen
  * amortized — NOT reuse of a previous iteration's cached subtree (Spark's
  * CacheManager matches canonicalized plans across rebuilt DataFrames, so
  * without the clear, q34/q35's cached signatures would carry over and the
  * cold−warm delta would overstate planning cost).
  * Usage: runMain graft.Profile q34_minhash_lsh …
  * Env SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench (both default 32,
  * matching the driver's local[32]). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.applyStaticEngineConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkEntry.applyEngineConfs(spark)
    // builder A/B knob: re-enable the runtime bloom injection EngineConfs
    // turns off, to measure its effect on a specific query/scale
    sys.env.get("SPARK_GRAFT_BLOOM").foreach(v =>
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", v))
    // builder A/B knobs (r17): adaptive execution + shuffle width, to
    // measure AQE's per-stage barrier cost on the eager fixpoint loops
    sys.env.get("SPARK_GRAFT_ADAPTIVE").foreach(v =>
      spark.conf.set("spark.sql.adaptive.enabled", v))
    sys.env.get("SPARK_GRAFT_SHUFFLE").foreach(v =>
      spark.conf.set("spark.sql.shuffle.partitions", v))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").count()
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        // optional phase split: force analysis+optimize+physical planning
        // before the action, so plan-time and run-time report separately
        // (codegen+JIT still lands in the run phase — it happens per
        // wholestage at first execution)
        val tPlan = if (sys.env.contains("SPARK_GRAFT_PHASES")) {
          df.queryExecution.executedPlan
          Some((System.nanoTime() - t0) / 1e9)
        } else None
        // noop sink for the same reason as Bench: count() would let
        // ColumnPruning delete the very expressions being profiled
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        SparkEntry.clearGraftCaches(spark)
        tPlan.foreach(p => println(f"PHASE $name plan=$p%.2f run=${dt - p}%.2f"))
        dt
      }
      println(f"PROFILE $name cold=${times(0)}%.2f warm=${times(1)}%.2f warm2=${times(2)}%.2f")
    }
    spark.stop()
  }
}
