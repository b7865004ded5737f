package graft.streaming

import org.apache.spark.sql.SparkSession
import graft.SparkEntry
import org.apache.spark.sql.streaming.Trigger

/** Runnable entry point for the streaming pipeline:
  *
  *   runMain graft.streaming.BnplApp <eventsDir> <stateDir> [--once]
  *
  * Continuous mode mirrors the reference deployment (consumer process
  * tailing the stream, 1 s cadence like consumer/consumer.go:95);
  * `--once` drains the existing backlog with Trigger.AvailableNow and
  * exits — the operational catch-up/replay mode (s09).
  */
object BnplApp {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BnplApp <eventsDir> <stateDir> [--once]")
    val once = args.contains("--once")
    val spark = SparkEntry.applyStaticEngineConfs(SparkSession.builder())
      .appName("graft-bnpl-pipeline")
      // spark-submit supplies the master on a cluster; default for local runs
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    graft.SparkEntry.applyEngineConfs(spark)
    spark.sparkContext.setLogLevel("WARN")

    val trigger = if (once) Trigger.AvailableNow() else Trigger.ProcessingTime("1 second")
    val notify = (batch: Long, users: Seq[String]) =>
      println(s"[notify] batch=$batch users=${users.mkString(",")}")
    val pipe = new BnplPipeline(spark, args(0), args(1), trigger, onUpdate = notify)
    val queries = pipe.start()
    if (once) {
      queries.foreach(_.awaitTermination())
      // Derived promise events self-loop through the event directory
      // (SURVEY §3.1's second broker hop) and land after AvailableNow's
      // snapshot — one more pass over the shared checkpoints drains them.
      val second = new BnplPipeline(spark, args(0), args(1), trigger, onUpdate = notify)
      second.start().foreach(_.awaitTermination())
      println(s"[bnpl] backlog drained; log rows=${second.eventsLog.count()}")
    } else {
      spark.streams.awaitAnyTermination()
    }
    spark.stop()
  }
}
