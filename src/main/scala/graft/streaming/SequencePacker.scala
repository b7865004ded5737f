package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.Pack

/** s23: streaming sequence packing — the online form of q96's next-fit
  * bin assembly: documents arrive in micro-batches (in doc_id order when
  * the upstream is the corpus feed) and each batch's documents are
  * appended to the SAME per-shard bins a single batch q96 pass would
  * build, by carrying exactly the state next-fit needs: the open bin's
  * (bin_id, fill) per shard — O(shards) state total, the s14 store
  * discipline with the tiniest possible store.
  *
  * Store layout (tailDir): one row per shard updated this batch —
  * (shard_id, fill, bin, batch_id) in the batch's own partition; the
  * live tail per shard is the row with the highest batch_id (LWW, the
  * s15/s17 read rule). Assignments land in assignDir partitioned by
  * batch_id. Replay safety: a re-run of batch b reads only tails with
  * batch_id < b — its own previous writes are invisible — recomputes
  * byte-identical output, and dynamic overwrite replaces its own
  * partitions (StreamingSpec pins the no-op).
  *
  * Batch-parity law (StreamingSpec): when documents arrive in doc_id
  * order (each batch's ids after the previous batch's), the accumulated
  * assignments — and therefore [[packedSummary]] — EQUAL batch q96 on
  * the concatenated corpus, because next-fit is a left fold and the
  * carried tail is its entire state.
  *
  * The arrival-order contract is ENFORCED, not assumed (r9 verdict item
  * 2 / r10 item 2): each tail carries the shard's doc_id high-water mark
  * and [[processBatch]] rejects — IllegalStateException, before any sink
  * write — a batch containing a doc at or below a touched shard's mark.
  * Next-fit is NOT order-insensitive (a doc appended late lands in a
  * later bin than the batch fold would have put it), so a violating
  * batch must die at the boundary rather than silently diverge from the
  * q96 parity the store promises. Replay stays legal: a re-run of batch
  * b checks against the marks as of b-1 (its own writes invisible),
  * exactly like its reads.
  *
  * Scale posture: per batch, one hash shuffle of the batch's documents
  * on shard_id + a within-partition sort + the linear iterator fold
  * (q96's packAssignments seeded with the tails); the tail read is
  * O(shards · batches-since-compaction) rows and the collect is
  * O(shards) — the same bounded driver state the q94 probe holds. */
object SequencePacker {

  /** Live (shard_id → (fill, bin, max_doc)) tails: highest-batch_id row
    * per shard below `batchId`. Empty map before any write (StoreRead
    * guard). `max_doc` is the shard's doc_id high-water mark — the
    * enforcement handle of the arrival-order contract. */
  private[graft] def readTails(spark: SparkSession, tailDir: String,
      batchId: Long): Map[Long, (Long, Long, Long)] = {
    if (!StoreRead.hasParquetData(spark, tailDir)) return Map.empty
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard_id")).orderBy(col("batch_id").desc)
    spark.read.parquet(tailDir)
      .filter(col("batch_id") < batchId) // replay: never see own tails
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("shard_id"), col("fill"), col("bin"), col("max_doc"))
      .collect() // O(shards) rows — bounded driver state by design
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
  }

  /** One micro-batch of (doc_id, text, …): assign bins continuing from
    * the stored tails, write assignments + new tails to own partitions. */
  def processBatch(batch: DataFrame, tailDir: String, assignDir: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    import spark.implicits._
    // bound the LWW read: fold committed tail partitions into the base
    // every TailCompactEvery batches (top-of-batch, so a replay of THIS
    // batch reads the base = state through batchId − 1, unchanged)
    if (batchId > 0 && batchId % StoreRead.TailCompactEvery == 0)
      StoreRead.compactLww(spark, tailDir, Seq("shard_id"), batchId)
    val tails = readTails(spark, tailDir, batchId)
    // arrival-order gate: O(shards) per-shard minima vs the stored
    // high-water marks, checked BEFORE any sink write so a violating
    // batch leaves both stores untouched (one map-side aggregate over
    // the batch; the collect is O(shards), the q94-probe bound)
    if (tails.nonEmpty) {
      val violations = batch
        .select((col("doc_id") % Pack.PackShards).as("shard_id"), col("doc_id"))
        .groupBy(col("shard_id")).agg(min(col("doc_id")).as("min_doc"))
        .collect().flatMap { r =>
          val s = r.getLong(0); val d = r.getLong(1)
          tails.get(s).collect { case (_, _, maxDoc) if d <= maxDoc =>
            s"shard $s: doc $d <= high-water $maxDoc"
          }
        }
      if (violations.nonEmpty) throw new IllegalStateException(
        s"s23 arrival-order contract violated in batch $batchId (next-fit " +
          s"is order-sensitive; q96 parity would silently break): " +
          violations.take(3).mkString("; "))
    }
    val asg = batch
      .select((col("doc_id") % Pack.PackShards).as("shard_id"), col("doc_id"),
        least(size(split(col("text"), " ")).cast("long"), lit(Pack.PackContext)).as("t"))
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("doc_id"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        // q96's fold, seeded from the carried tails: fill < 0 marks "no
        // open bin yet" (a fresh shard opens bin 0 with this doc)
        var shard = Long.MinValue
        var fill = -1L
        var bin = 0L
        it.map { case (s, d, t) =>
          if (s != shard) {
            shard = s
            val (pf, pb, _) = tails.getOrElse(s, (-1L, 0L, Long.MinValue))
            fill = pf; bin = pb
          }
          if (fill < 0L) { bin = 0L; fill = t }
          else if (fill + t > Pack.PackContext) { bin += 1L; fill = t }
          else fill += t
          (s, d, t, bin, fill)
        }
      }
      .toDF("shard_id", "doc_id", "t", "bin_id", "fill_after")
      // eager pin: feeds the assignment write AND the tail aggregate, and
      // the dynamic overwrite below rewrites paths a lazy plan might
      // re-read (r9 pinning discipline)
      .localCheckpoint(true)
    asg.select(col("shard_id"), col("doc_id"), col("t"), col("bin_id"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(assignDir)
    // new tail per touched shard = state after that shard's LAST doc,
    // plus the shard's new doc_id high-water mark (the order gate above
    // guarantees it's this batch's max — all stored docs sit below it)
    asg.groupBy(col("shard_id"))
      .agg(max_by(struct(col("fill_after").as("fill"), col("bin_id").as("bin")),
        col("doc_id")).as("m"),
        max(col("doc_id")).as("max_doc"))
      .select(col("shard_id"), col("m").getField("fill").as("fill"),
        col("m").getField("bin").as("bin"), col("max_doc"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(tailDir)
  }

  /** The q96-shaped summary over everything packed so far: bins span
    * batches, so the aggregate keys on (shard_id, bin_id) across all
    * assignment partitions. Schema-stable empty frame before the first
    * write. */
  def packedSummary(spark: SparkSession, assignDir: String): DataFrame = {
    val rows =
      if (!StoreRead.hasParquetData(spark, assignDir))
        spark.range(0).select(col("id").as("shard_id"), col("id").as("doc_id"),
          col("id").as("t"), col("id").as("bin_id"))
      else
        spark.read.parquet(assignDir)
          .select(col("shard_id"), col("doc_id"), col("t"), col("bin_id"))
    rows
      .groupBy(col("shard_id"), col("bin_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("t")).as("bin_tokens"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .withColumn("fill4", graft.ops.Dsl.ratio4(col("bin_tokens"), lit(Pack.PackContext)))
      .orderBy(col("shard_id"), col("bin_id"))
  }

  /** Wire a streaming (doc_id, text, …) source into the packing loop. */
  def start(docs: DataFrame, tailDir: String, assignDir: String,
      checkpointDir: String): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, tailDir, assignDir, batchId)
      }
      .start()
}
