package graft
import org.apache.spark.sql.SparkSession

/** Builder inner-loop plan dump (not part of the driver contract): prints
  * each named query's formatted physical plan — the "is this the plan I'd
  * want at 100×" audit loop. Env vars as in Bench.
  * Usage: runMain graft.Explain q37_cosine_neardup … */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.applyStaticEngineConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkEntry.applyEngineConfs(spark)
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
