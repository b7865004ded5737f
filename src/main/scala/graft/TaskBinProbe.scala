package graft
import org.apache.spark.sql.SparkSession

/** Builder inner-loop diagnostic (not part of the driver contract):
  * attributes `DAGScheduler: Broadcasting large task binary` WARNs to the
  * query that triggers them. Bench interleaves its passes, so its tail
  * WARNs are unattributable (the r11 verdict's item 2); this runs each
  * named query (default: all) once at WARN level with a stderr marker
  * between queries — grep the output for markers adjacent to the WARN.
  * A >1 MiB task binary means some plan compiles a large literal table
  * into the task closure: scheduler pressure at 1000-executor scale
  * (every stage submission rebroadcasts it).
  * Usage: runMain graft.TaskBinProbe [query …]; env as in Bench. */
object TaskBinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.applyStaticEngineConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkEntry.applyEngineConfs(spark)
    spark.sparkContext.setLogLevel("WARN")
    // diagnostic toggle: SPARK_GRAFT_CODEGEN=false reruns the probe with
    // whole-stage codegen off — if the large-binary WARN vanishes, the
    // payload is the generated source text shipped inside the stage
    // closure, not a literal data table
    sys.env.get("SPARK_GRAFT_CODEGEN").foreach(v =>
      spark.conf.set("spark.sql.codegen.wholeStage", v))
    spark.range(1000).selectExpr("sum(id)").count()
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq
    names.foreach { name =>
      System.err.println(s"### PROBE $name")
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"### PROBE $name FAILED: ${e.getMessage}") }
      SparkEntry.clearGraftCaches(spark)
    }
    System.err.println("### PROBE done")
    spark.stop()
  }
}
