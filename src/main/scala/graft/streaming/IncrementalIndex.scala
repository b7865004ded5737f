package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.Text

/** s15: streaming incremental inverted index — the PRODUCTION form of
  * q91's batch index build: documents arrive as a stream and the
  * (token, doc_id, tf) posting store is maintained incrementally, with
  * the q91 aggregation (df / cf / bounded posting sample) as a read-side
  * VIEW over the store rather than a corpus rebuild.
  *
  * `foreachBatch` writes each micro-batch's term frequencies — computed
  * by the SAME [[Text.termFrequencies]] kernel q91 uses, so batch and
  * stream tokenize identically by construction — as the batch's own
  * `batch_id` partition. Unlike s14's admission transaction, the upsert
  * never READS the store: a batch's postings are a pure function of the
  * batch, so the write is the whole transaction and s14's
  * `batch_id < current` read filter has nothing to guard. REPLAY SAFETY
  * is therefore just the s14 write discipline: partition by batch_id +
  * dynamic-partition-overwrite, so an at-least-once re-run REPLACES its
  * own partition with bit-identical rows instead of appending beside
  * the first attempt's.
  *
  * A doc_id re-submitted in a later batch is an UPDATE: the read view
  * resolves last-writer-wins per doc (keep the rows of the doc's max
  * batch_id — q27's LWW projection discipline applied to postings), so
  * stale postings of the superseded version never reach the index.
  *
  * The store accretes one partition per batch; every [[CompactEvery]]
  * batches [[compactStore]] folds all committed partitions into the
  * single base partition batch_id = −1 (still below every future batch).
  * The fold RESOLVES LWW physically (superseded doc versions are dropped,
  * not carried), and every failure point preserves the read view: the
  * base overwrite completes BEFORE any per-batch partition is deleted,
  * and until a doc's winning partition is deleted the view's LWW picks
  * that partition's rows — which are exactly what the base stored for
  * the doc — so a crash + re-run anywhere in the fold leaves the index
  * unchanged (the StreamingSpec law).
  *
  * Scale posture: per batch, work is ONE map-side-combined aggregation of
  * the batch's token stream and an append-sized partition write — the
  * corpus-scale token stream is never re-shuffled. The read view is q91's
  * two-exchange plan over the store plus the LWW window; after
  * compaction the store is one partition of (token, doc_id, tf) rows —
  * vocab × avg-df, the same frame q91 aggregates. */
object IncrementalIndex {

  /** Fold the store's base partition every this-many batches. */
  val CompactEvery = 8L

  /** One micro-batch upsert. Exposed for direct testing. */
  def processBatch(batch: DataFrame, storeDir: String, batchId: Long): Unit = {
    if (batch.isEmpty) return
    if (batchId > 0 && batchId % CompactEvery == 0)
      compactStore(batch.sparkSession, storeDir, batchId)
    Text.termFrequencies(batch)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(storeDir)
  }

  /** The store's current posting rows after per-doc LWW resolution —
    * (token, doc_id, tf), one version per doc. */
  private def currentPostings(spark: SparkSession, storeDir: String): DataFrame = {
    val wd = Window.partitionBy(col("doc_id"))
    spark.read.parquet(storeDir)
      .select(col("token"), col("doc_id"), col("tf"),
        col("batch_id").cast("long").as("batch_id"))
      .withColumn("mx", max(col("batch_id")).over(wd))
      .filter(col("batch_id") === col("mx"))
      .select(col("token"), col("doc_id"), col("tf"))
  }

  /** The index as q91 would report it over the streamed corpus: the q91
    * aggregation applied to the LWW-resolved store (the batch-parity law
    * in StreamingSpec is equality with Text.q91 after streaming the same
    * documents). */
  def readIndex(spark: SparkSession, storeDir: String): DataFrame =
    Text.indexOf(currentPostings(spark, storeDir))

  /** Fold every committed store partition (0 ≤ batch_id < upToBatch) plus
    * the previous base into ONE LWW-resolved base partition
    * (batch_id = −1), then delete the folded per-batch partitions.
    * Failure analysis, by write order: the base lands BEFORE any delete,
    * so at every intermediate point each doc's max surviving batch_id
    * holds exactly the rows the resolved base holds for it (either the
    * winning partition still exists, or the base — now the doc's only
    * copy — holds the winner's rows), and the read view is invariant; a
    * re-run folds the leftovers to the same base. The read is
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
    val wd = Window.partitionBy(col("doc_id"))
    val base = spark.read.parquet(storeDir)
      .select(col("token"), col("doc_id"), col("tf"),
        col("batch_id").cast("long").as("batch_id"))
      .filter(col("batch_id") < upToBatch) // includes the previous base (−1)
      .withColumn("mx", max(col("batch_id")).over(wd))
      .filter(col("batch_id") === col("mx"))
      .select(col("token"), col("doc_id"), col("tf"))
      .localCheckpoint(true) // pin: the overwrite below rewrites the source path
    base.withColumn("batch_id", lit(-1L))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(storeDir)
    folded.foreach(p => fs.delete(p, true))
  }

  /** s18: BM25 search served FROM the incremental store — the query-time
    * read path that makes s15 an index rather than an archive. Document
    * lengths come from the store itself (Σtf per doc IS the whitespace
    * token count, exactly q92's `size(split(text))`), the tf frame is the
    * LWW-resolved postings filtered to the query terms, and the scoring
    * is the SAME [[Text.bm25Rank]] kernel q92 runs — so search-vs-batch
    * parity is by construction, pinned as a StreamingSpec law (equality
    * with Text.q92 after streaming the same corpus, and LWW: an updated
    * doc is scored only in its latest version).
    *
    * Scale posture: the length frame is one map-side-combined aggregate
    * of the store (vocab × avg-df rows, already far below corpus token
    * scale); the term filter bounds the scoring side to the query terms'
    * posting lists before any shuffle (q92's argument); the final
    * ranking is a TakeOrdered. The LWW window rides the store's own
    * doc_id partitioning. */
  def search(spark: SparkSession, storeDir: String,
      terms: Seq[String] = Text.Bm25Query): DataFrame = {
    // Materialize the LWW resolution ONCE: dl and tf both derive from it,
    // and without the pin the full store scan + max-batch window would
    // execute twice per search (advisor r7).
    val cur = currentPostings(spark, storeDir).localCheckpoint(true)
    val dl = cur.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val tf = cur.filter(col("token").isin(terms: _*))
      .select(col("doc_id"), col("token"), col("tf"))
    Text.bm25Rank(tf, dl)
  }

  /** Wire a streaming (doc_id, text, …) source into the upsert loop. */
  def start(docs: DataFrame, storeDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, storeDir, batchId)
      }
      .start()
}
