package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Vectors

/** Conf A/B diagnostic (round-12 open question): re-time a query at a
  * chosen amplification factor with a single runtime conf toggled, in
  * interleaved A/B/A/B order so machine drift can't masquerade as a
  * conf effect. Motivation: `EngineConfs` disables
  * InjectRuntimeFilter's blooms (measured 20–30% faster at sf0.1 and
  * ×32), but the r12 ×64 confirm octave came out super-linear on every
  * leg while the r11 octave — run with blooms ON — did not; before
  * trusting the blanket disable the ×64 density point needs its own
  * measurement. Reads the ladder corpus `target/scale/x{A}` BenchScale
  * already built.
  *
  * Usage: AbProbe <factor> <conf-key> <query> [query...]
  * Diagnostic only — not part of the declared surface.
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val factor = args(0).toInt
    val confKey = args(1)
    val queryKeys = args.drop(2).toSeq
    val scaleRoot = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "target/scale")
    val dir = s"$scaleRoot/x$factor"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val passes = sys.env.getOrElse("SPARK_GRAFT_AB_PASSES", "2").toInt

    val spark = SparkEntry.applyStaticEngineConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      // same partition rule as the BenchScale ladder leg
      .config("spark.sql.shuffle.partitions", cpus * math.max(1, factor / 8))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkEntry.applyEngineConfs(spark)
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()

    val bits = BenchScale.scaledBits(factor)
    val wide: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      graft.ops.Ann.bucketsWide(_, bits)
    def resolve(key: String): (SparkSession, String) => DataFrame = key match {
      case "q77_knn_join" => (s, d) =>
        Vectors.knnPairsOn(graft.tables.Tables.embeddings(s, d), wide)
          .orderBy(col("src"), col("rk"))
      case "q104_mutual_knn_clusters" => (s, d) =>
        Vectors.mutualKnnClustersOn(
          Vectors.knnPairsOn(graft.tables.Tables.embeddings(s, d), wide))
      case k => SparkEntry.queries(k)
    }

    for (key <- queryKeys) {
      val fn = resolve(key)
      for (p <- 1 to passes; v <- Seq("true", "false")) {
        spark.conf.set(confKey, v)
        val t0 = System.nanoTime()
        val rows =
          try fn(spark, dir).count()
          catch { case e: Throwable =>
            System.err.println(s"[ab] $key $confKey=$v FAILED: ${e.getMessage}")
            -1L
          } finally SparkEntry.clearGraftCaches(spark)
        println(f"[ab] x$factor $key%-28s $confKey=$v%-5s pass$p ${(System.nanoTime() - t0) / 1e9}%8.2f s rows=$rows")
      }
      SparkEntry.applyEngineConfs(spark) // restore the engine default
    }
    spark.stop()
  }
}
