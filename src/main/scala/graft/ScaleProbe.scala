package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-rehearsal diagnostic: where does the LSH candidate volume go as
  * the corpus amplifies? For each (factor, bits) prints the bucket
  * occupancy profile of [[graft.ops.Ann.bucketsWide]] over the amplified
  * embeddings — total signature rows, occupied buckets, max occupancy,
  * and Σocc·(occ−1) (the exact candidate-pair volume q77's bucket join
  * produces before distinct) split into within-replica and cross-replica
  * mass. Reads `target/scale/x{A}`; prints one line per probe. Diagnostic
  * only — not part of the declared surface.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val scaleRoot = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "target/scale")
    val spark = SparkEntry.applyStaticEngineConfs(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkEntry.applyEngineConfs(spark)
    spark.sparkContext.setLogLevel("WARN")
    val probes = if (args.nonEmpty) args.toSeq.map { s =>
      val Array(a, b) = s.split(":"); (a.toInt, b.toInt)
    } else Seq((1, 4), (4, 6), (32, 9))
    for ((a, bits) <- probes) {
      val emb = spark.read.parquet(s"$scaleRoot/x$a/embeddings.parquet")
      val sig = emb.select(col("vec_id"),
          posexplode(graft.ops.Ann.bucketsWide(col("embedding"), bits))
            .as(Seq("t", "bucket")),
          (col("vec_id") / ScaleGen.IdStride).cast("int").as("rep"))
      val occ = sig.groupBy("t", "bucket")
        .agg(count(lit(1)).as("occ"),
          countDistinct(col("rep")).as("nrep"),
          // per-replica occupancy sum of squares, for the within-replica
          // pair mass: Σ_r occ_r² per bucket
          sum(lit(1L)).as("occ2_dummy"))
      val perRep = sig.groupBy("t", "bucket", "rep").agg(count(lit(1)).as("occr"))
      val within = perRep.agg(sum(col("occr") * (col("occr") - 1)).as("within"))
        .collect()(0).getLong(0)
      val stats = occ.agg(
        count(lit(1)).as("nbuckets"),
        max(col("occ")).as("maxocc"),
        sum(col("occ") * (col("occ") - 1)).as("pairs"),
        avg(col("nrep")).as("avgreps")).collect()(0)
      val pairs = stats.getLong(2)
      println(f"[probe] x$a bits=$bits nbuckets=${stats.getLong(0)} " +
        f"maxocc=${stats.getLong(1)} pairs=$pairs within=$within " +
        f"cross=${pairs - within} avgreps=${stats.getDouble(3)}%.1f")
    }
    spark.stop()
  }
}
