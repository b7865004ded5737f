package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Dsl.h60
import graft.queries.{Dedup, Text}

/** s14: incremental corpus near-dedup — the PRODUCTION form of the
  * q34→q57→q66 batch pipeline: documents arrive as a stream, and each
  * micro-batch is admitted against the corpus accepted SO FAR, not
  * re-deduped from scratch. `foreachBatch` implements the
  * read-check-append transaction against a materialized band-signature
  * store:
  *
  *   1. signatures + banded LSH keys for the batch (the exact q34
  *      kernels — `Dedup.signatures` / `Dedup.bandKeys` — so stream and
  *      batch bucket identically by construction);
  *   2. a doc is REJECTED iff it shares any (band_id, bk) bucket with a
  *      previously admitted doc (store left-semi) or with a smaller-id
  *      doc of its own batch (the q66 keep-min-representative rule,
  *      applied greedily per batch);
  *   3. survivors append to the accepted sink; their band keys append to
  *      the store. Rejected docs are logged to a reject sink with the
  *      batch id — dedup pipelines audit drops, they don't silently eat
  *      them.
  *
  * Admission is deliberately GREEDY (any bucket collision with an
  * already-admitted or smaller-id doc rejects): unlike q57's connected
  * components it never chains through rejected docs, so what the corpus
  * holds depends only on arrival order — deterministic here because
  * doc_ids order each batch and batches are ordered. That is the policy
  * every online dedup runs; the batch CC pipeline remains the tool for
  * retroactive re-clustering.
  *
  * Scale posture: per batch, work is the batch's shingle volume (one
  * grouped signature aggregate, map-side combined) plus ONE left-semi
  * join of docs×Bands keys against the store — the store is read
  * filtered to the batch's band keys by the join, never collected, and
  * grows by exactly the survivors' keys.
  *
  * REPLAY SAFETY (what makes "transaction" an earned word): foreachBatch
  * is at-least-once — a batch can re-run after any partial failure. The
  * admission decision is a pure function of (batch contents, store
  * partitions with batch_id < this batch), because (1) every sink is
  * PARTITIONED BY batch_id and written with dynamic-partition-overwrite,
  * so a re-run REPLACES its own partition instead of appending next to
  * the first attempt's rows, and (2) the store read filters
  * batch_id < batchId, so a re-run never left-semi-joins the batch
  * against its OWN just-stored band keys (which would flip its accepts
  * to rejects). Partitions below the current batch are immutable —
  * Structured Streaming starts batch N only after N−1 committed — so
  * replays recompute bit-identical decisions and overwrite partitions
  * with identical content: idempotent end to end (pinned in
  * StreamingSpec by running the same batch twice).
  *
  * The store would otherwise accrete one small partition per batch
  * forever; every CompactEvery batches [[compactStore]] folds all
  * committed partitions into the single base partition batch_id = −1
  * (still < every future batchId, so the read filter keeps seeing it).
  * Every failure point of the fold preserves the store's KEY SET —
  * duplicate keys across base and not-yet-deleted partitions are
  * harmless to a left-semi — so compaction can never change an
  * admission decision (the StreamingSpec law).
  */
object IncrementalDedup {

  /** Fold the store's base partition every this-many batches. */
  val CompactEvery = 8L

  /** One micro-batch admission transaction. Exposed for direct testing. */
  def processBatch(batch: DataFrame, storeDir: String,
      acceptDir: String, rejectDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    if (batchId > 0 && batchId % CompactEvery == 0)
      compactStore(spark, storeDir, batchId)
    val sh = Text.shinglesOf(batch)
      .select(col("doc_id"), (h60(col("shingle")) % Dedup.P).as("hm"))
    // Eager localCheckpoint, not lazy cache: `hitBatch` below SELF-joins
    // this frame (q104 shape; r9 pinning sweep). Checkpoint blocks live
    // outside the catalog, so the per-batch cleanup diffs the persistent-
    // RDD set instead of calling DataFrame.unpersist.
    val rddsBefore = spark.sparkContext.getPersistentRDDs.keySet
    val bands = Dedup.bandKeys(Dedup.signatures(sh)).localCheckpoint(true)
    try {
      // probe through hasParquetData, not a catch: Spark's missing-path
      // error class has shifted across releases (AnalysisException vs
      // FileNotFoundException — bit us on the first-ever read of a fresh
      // store root), and the explicit probe is the same discipline every
      // other store module uses
      val store =
        if (!StoreRead.hasParquetData(spark, storeDir))
          spark.emptyDataFrame.select(lit(0).as("band_id"), lit("").as("bk")).limit(0)
        else spark.read.parquet(storeDir)
          .filter(col("batch_id") < batchId) // replay: never see own keys
          .select(col("band_id"), col("bk"))
      val hitStore = bands
        .join(store, Seq("band_id", "bk"), "left_semi")
        .select(col("doc_id"))
      // within-batch: any bucket shared with a SMALLER doc_id rejects
      val hitBatch = bands.as("a")
        .join(bands.as("b"),
          col("a.band_id") === col("b.band_id") && col("a.bk") === col("b.bk") &&
            col("a.doc_id") > col("b.doc_id"))
        .select(col("a.doc_id").as("doc_id"))
      // eager pin: feeds the anti/semi/anti join trio below (r9 sweep)
      val rejected = hitStore.union(hitBatch).distinct().localCheckpoint(true)
      def writeOwnPartition(df: DataFrame, dir: String): Unit =
        df.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(dir)
      writeOwnPartition(batch.join(rejected, Seq("doc_id"), "left_anti"), acceptDir)
      writeOwnPartition(batch.join(rejected, Seq("doc_id"), "left_semi"), rejectDir)
      writeOwnPartition(bands.join(rejected, Seq("doc_id"), "left_anti"), storeDir)
    } finally {
      // free this batch's checkpoint blocks (and nothing else's); the
      // blocks are dead — the batch is committed — so the per-RDD
      // lineage-truncation WARN is noise, suppressed scoped (the
      // clearGraftCaches discipline)
      graft.SparkEntry.silencingRddWarns {
        spark.sparkContext.getPersistentRDDs
          .filter { case (id, _) => !rddsBefore.contains(id) }
          .values.foreach(_.unpersist(blocking = false))
      }
    }
  }

  /** Fold every committed store partition (0 ≤ batch_id < upToBatch) plus
    * the previous base into ONE distinct-keyed base partition
    * (batch_id = −1), then delete the folded per-batch partitions — the
    * Layout-compaction step wired into the admission loop. Failure
    * analysis, by write order: the base overwrite completes BEFORE any
    * per-batch partition is deleted, so at every intermediate point the
    * store's key set over batches < upToBatch is a superset of what one
    * clean pass would leave (extra duplicates at worst, never a missing
    * key), and a re-run folds the leftovers — admission decisions are
    * invariant under crash + retry anywhere in this method. The read is
    * localCheckpoint-pinned before the overwrite touches the same path. */
  def compactStore(spark: SparkSession, storeDir: String, upToBatch: Long): Unit = {
    import org.apache.hadoop.fs.{FileSystem, Path}
    val dir = new Path(storeDir)
    val fs = FileSystem.get(dir.toUri, spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return
    val folded = fs.listStatus(dir).map(_.getPath).filter { p =>
      p.getName.startsWith("batch_id=") &&
        scala.util.Try(p.getName.stripPrefix("batch_id=").toLong)
          .toOption.exists(v => v >= 0 && v < upToBatch)
    }
    if (folded.isEmpty) return
    val base = spark.read.parquet(storeDir)
      .filter(col("batch_id") < upToBatch) // includes the previous base (−1)
      .drop("batch_id").distinct()
      .localCheckpoint(true) // pin: the overwrite below rewrites the source path
    base.withColumn("batch_id", lit(-1L))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(storeDir)
    folded.foreach(p => fs.delete(p, true))
  }

  /** Wire a streaming (doc_id, text, …) source into the admission loop. */
  def start(docs: DataFrame, storeDir: String, acceptDir: String,
      rejectDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, storeDir, acceptDir, rejectDir, batchId)
      }
      .start()
}
