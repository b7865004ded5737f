package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Vectors

/** Fresh-JVM growth-exponent probe (round-12): re-time a set of queries
  * at ONE amplification factor in a JVM that has run nothing else, so
  * the ×64 confirm octave isn't measured through the heap/GC residue of
  * the full BenchScale ladder that precedes it in-run (the r12 48g run
  * peaked at 42.5 GiB BEFORE the confirm section started; the 24g run
  * before it showed fresh-JVM q36 25 s vs 36 s in-run). One process per
  * factor = one heap state per leg; the exponent is then fit across two
  * processes with identical -Xmx, which is also how a real cluster
  * scales (fresh executors per job, not one long-lived heap).
  *
  * Usage: ExpProbe <factor> <query> [query...]  (min-of-N interleaved
  * passes, N = SPARK_GRAFT_EXP_PASSES, default 2). Reads the ladder
  * corpus `target/scale/x{A}` BenchScale already built. Diagnostic
  * only — not part of the declared surface.
  */
object ExpProbe {
  def main(args: Array[String]): Unit = {
    val factor = args(0).toInt
    val queryKeys = args.drop(1).toSeq
    val scaleRoot = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "target/scale")
    val dir = s"$scaleRoot/x$factor"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val passes = sys.env.getOrElse("SPARK_GRAFT_EXP_PASSES", "2").toInt

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
      // r14: same shared-knn form as the ladder leg — consume the
      // materialized graph (built here if the ladder hasn't), measuring
      // the mutual-filter + CC machinery q104 adds on top of q77's build
      case "q104_mutual_knn_clusters" => (s, d) =>
        { BenchScale.ensureKnnGraph(s, d, factor)
          Vectors.mutualKnnClustersOn(
            s.read.parquet(BenchScale.knnGraphPath(d, bits))) }
      // q90's TUNED operating point (r12 verdict item 1b): subcode bits
      // sized to the ladder leg so per-query candidate volume stays at the
      // design density — the linear-work dial next to q90's N^1.5 probe
      case "q90_tuned" => (s, d) =>
        Vectors.ivfKnnTuned(s, d, Vectors.NProbe, BenchScale.tunedSubBits(factor))
      case "q147_filtered_tuned_ann" => (s, d) =>
        Vectors.ivfKnnFilteredTuned(s, d, Vectors.NProbe, BenchScale.tunedSubBits(factor))
      // r15: hard negatives at the tuned point (the q181 ladder leg;
      // renamed from q158_tuned in r16 — old key kept resolving so prior
      // expprobe.jsonl lines stay reproducible)
      case "q181_tuned" | "q158_tuned" => (s, d) =>
        Vectors.hardNegativesTuned(s, d, Vectors.NProbe, BenchScale.tunedSubBits(factor))
      // r16: MMR over tuned-IVF candidates at the scale-keyed width
      case "q186_mmr_tuned" => (s, d) =>
        Vectors.mmrTuned(s, d, Vectors.NProbe, BenchScale.tunedSubBits(factor))
      // r15: the q77 knob-vs-kernel A/B — previous octave's bits held
      // fixed at this factor (~2× the scheduled leg's candidate volume)
      case "q77_fixed_bits" => (s, d) =>
        Vectors.knnPairsOn(graft.tables.Tables.embeddings(s, d),
            graft.ops.Ann.bucketsWide(_, BenchScale.scaledBits(factor / 2)))
          .orderBy(col("src"), col("rk"))
      case k => SparkEntry.queries(k)
    }

    val best = scala.collection.mutable.Map.empty[String, (Double, Long)]
    for (p <- 1 to passes; key <- queryKeys) {
      val fn = resolve(key)
      val t0 = System.nanoTime()
      val rows =
        try fn(spark, dir).count()
        catch { case e: Throwable =>
          System.err.println(s"[exp] $key FAILED: ${e.getMessage}")
          -1L
        } finally SparkEntry.clearGraftCaches(spark)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[exp] x$factor $key%-28s pass$p $dt%8.2f s rows=$rows")
      if (rows >= 0 && best.get(key).forall(_._1 > dt)) best(key) = (dt, rows)
    }
    val out = new java.io.PrintWriter(new java.io.FileWriter(
      s"$scaleRoot/expprobe.jsonl", /* append = */ true))
    try for ((key, (dt, rows)) <- best) {
      val line =
        f"""{"probe":"exp","factor":$factor,"query":"$key","min_sec":$dt%.2f,"rows":$rows}"""
      println(line)
      out.println(line) // BenchScale's report embeds these as fresh_jvm_confirm
    } finally out.close()
    spark.stop()
  }
}
