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
  * grows by exactly the survivors' keys. The store is a plain
  * partitioned parquet append: no compaction logic here, because the
  * per-batch append is docs×Bands rows (tiny), and a real deployment
  * periodically rewrites it with `graft.sources.Layout`'s compaction.
  */
object IncrementalDedup {

  /** One micro-batch admission transaction. Exposed for direct testing. */
  def processBatch(batch: DataFrame, storeDir: String,
      acceptDir: String, rejectDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    val sh = Text.shinglesOf(batch)
      .select(col("doc_id"), (h60(col("shingle")) % Dedup.P).as("hm"))
    val bands = Dedup.bandKeys(Dedup.signatures(sh)).cache()
    try {
      val store =
        try spark.read.parquet(storeDir).select(col("band_id"), col("bk"))
        catch { case _: org.apache.spark.sql.AnalysisException =>
          spark.emptyDataFrame.select(lit(0).as("band_id"), lit("").as("bk")).limit(0) }
      val hitStore = bands
        .join(store, Seq("band_id", "bk"), "left_semi")
        .select(col("doc_id"))
      // within-batch: any bucket shared with a SMALLER doc_id rejects
      val hitBatch = bands.as("a")
        .join(bands.as("b"),
          col("a.band_id") === col("b.band_id") && col("a.bk") === col("b.bk") &&
            col("a.doc_id") > col("b.doc_id"))
        .select(col("a.doc_id").as("doc_id"))
      val rejected = hitStore.union(hitBatch).distinct().cache()
      val accepted = batch.join(rejected, Seq("doc_id"), "left_anti")
      accepted.write.mode("append").parquet(acceptDir)
      batch.join(rejected, Seq("doc_id"), "left_semi")
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(rejectDir)
      bands.join(rejected, Seq("doc_id"), "left_anti")
        .write.mode("append").parquet(storeDir)
      rejected.unpersist()
    } finally bands.unpersist()
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
