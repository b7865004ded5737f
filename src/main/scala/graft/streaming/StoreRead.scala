package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared guard for the streaming stores' read paths (advisor r8).
  *
  * A store/audit directory can be UNREADABLE by `spark.read.parquet` in
  * two distinct states that are both legitimate mid-pipeline moments:
  * the directory does not exist yet (no batch has committed), or it
  * exists but holds no parquet footers — an empty dynamic-overwrite
  * write (every row filtered out, e.g. a clean decontamination batch)
  * leaves only `_SUCCESS` behind. `Novelty.priorStore` guarded the
  * first state; this helper covers both so every reader can fall back
  * to a schema-stable empty frame instead of throwing
  * path-not-found / schema-inference errors at a panel query. */
object StoreRead {

  /** The ONE definition of the additive stores' coverage watermark
    * (s16/s21/s29): the base partition's covered_upto, 0 when no base
    * exists. Returned as a one-row frame so the watermark read can
    * broadcast it without a driver round-trip; [[coveredUpto]] is the
    * collected form the fold guard and the sweep cutoff use. Readers,
    * guards and sweeps MUST agree on this aggregate — encoding drift
    * between them silently double-counts or over-deletes. */
  def coveredUptoFrame(all: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    all.filter(col("batch_id") === -1L)
      .agg(coalesce(max(col("covered_upto")), lit(0L)).as("_upto"))

  /** [[coveredUptoFrame]] as a driver value. */
  def coveredUpto(all: org.apache.spark.sql.DataFrame): Long =
    coveredUptoFrame(all).collect()(0).getLong(0)

  /** True iff `dirStr` exists and contains at least one parquet data
    * file (footer), searching recursively through partition dirs.
    * Metadata files (`_SUCCESS`, `.*.crc`, …) do not count. */
  def hasParquetData(spark: SparkSession, dirStr: String): Boolean = {
    val dir = new Path(dirStr)
    val fs = FileSystem.get(dir.toUri, spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return false
    val it = fs.listFiles(dir, true)
    while (it.hasNext) {
      val n = it.next().getPath.getName
      if (n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
        return true
    }
    false
  }

  /** Fold a keyed-LWW tail store's committed batch partitions every
    * this-many batches (the s15/s16/s21 cadence). */
  val TailCompactEvery = 8L

  /** Fold every committed tail partition (0 ≤ batch_id < upToBatch)
    * plus the previous base into ONE LWW-resolved base partition
    * (batch_id = −1, still below every future batch), then delete the
    * folded per-batch partitions — s15's compaction discipline lifted
    * to any keyed-LWW tail store (s23 shard tails, s24/s25/s27 user
    * tails). Without this the LWW read scans one partition per batch
    * ever committed — unbounded in stream lifetime; with it the store
    * is O(keys) + CompactEvery partitions at any moment.
    *
    * Failure analysis, by write order (s15's argument verbatim): the
    * base lands BEFORE any delete, so at every intermediate point each
    * key's max surviving batch_id holds exactly the rows the resolved
    * base holds for it (either the winning partition still exists, or
    * the base — now the key's only copy — holds the winner's row), and
    * the LWW read view is invariant; a crashed fold re-runs to the same
    * base. Callers trigger it at the TOP of batch `upToBatch`, so a
    * replay of that batch reads the base — LWW state through
    * upToBatch − 1, exactly what the uncompacted read gave it — and the
    * order-gate marks ride the fold like any tail column. NULL keys
    * form one window group, preserving the null-user tails.
    *
    * The fold itself is one shuffle of O(keys + CompactEvery·touched)
    * rows on the key — never event-scale. */
  def compactLww(spark: SparkSession, dirStr: String, keyCols: Seq[String],
      upToBatch: Long): Unit = {
    val dir = new Path(dirStr)
    val fs = FileSystem.get(dir.toUri, spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return
    val folded = fs.listStatus(dir).map(_.getPath).filter { p =>
      p.getName.startsWith("batch_id=") &&
        scala.util.Try(p.getName.stripPrefix("batch_id=").toLong)
          .toOption.exists(v => v >= 0 && v < upToBatch)
    }
    if (folded.isEmpty) return
    val raw = spark.read.parquet(dirStr)
    val payload = raw.columns.filter(_ != "batch_id").toSeq
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("batch_id").desc)
    val base = raw
      .filter(col("batch_id").cast("long") < upToBatch) // incl. previous base (−1)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(payload.map(col): _*)
      .localCheckpoint(true) // pin: the overwrite below rewrites the source path
    base.withColumn("batch_id", lit(-1L))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(dirStr)
    folded.foreach(p => fs.delete(p, true))
    ()
  }
}
