package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.Text

/** s19: streaming decontamination — the PRODUCTION form of the q67/q101
  * benchmark-overlap audit: the benchmark suite is STATIC (it changes by
  * release, not by record), train documents arrive as a stream, and every
  * micro-batch is audited map-side against a broadcast Bloom prefilter
  * before the exact shingle join — exactly q101's asymmetry
  * (`Text.q101`), lifted into `foreachBatch`.
  *
  * The benchmark index is built ONCE at query start ([[benchIndexOf]]):
  * the distinct shingle hashes of the benchmark corpus plus the
  * serialized Bloom over them (the same distributed one-pass
  * `BloomFilterAggregate` build as q101 — `Text.bloomOf`). Each batch
  * then runs the q67 kernel restricted to the batch: shingle the batch's
  * docs (`Text.shinglesOf` — the one shingling definition everywhere),
  * hash, distinct, DROP everything the Bloom rejects (map-side, inside
  * the scan's codegen — the shuffled volume is ~fpp of the batch plus
  * the true overlap), equi-join the surviving hashes against the bench
  * shingle table, and keep (train_doc, bench_doc) pairs sharing ≥
  * `Text.ContamMinShared` shingles. A doc arrives whole in one batch and
  * the audit groups only within (train_doc, bench_doc), so per-batch
  * results are complete — no cross-batch state at all: the operator is
  * STATELESS, the cheapest kind of streaming operator to run at scale.
  *
  * REPLAY SAFETY: the verdict is a pure function of (batch contents,
  * static bench index), and the sink is batch_id-partitioned with
  * dynamic-partition-overwrite (the s14 discipline), so an at-least-once
  * re-run rewrites its own partition with identical rows.
  *
  * StreamingSpec pins: streamed audit over N batches == batch q67 (and
  * therefore q101, which shares q67's oracle) on the same corpus;
  * replay no-op; a clean batch contributes zero rows. */
object Decontamination {

  /** The static benchmark side, built once per deployment: distinct
    * (bench_doc, hm) shingle hashes + the serialized Bloom over hm
    * (null for an empty benchmark — might_contain then rejects all). */
  final case class BenchIndex(shingles: DataFrame, bloom: Array[Byte])

  /** Build [[BenchIndex]] from a (doc_id, text, …) benchmark frame. The
    * shingle table is checkpointed: it is read by every batch (join
    * side) and the Bloom build would otherwise recompute it. */
  def benchIndexOf(benchDocs: DataFrame): BenchIndex = {
    val sh = Text.shinglesOf(benchDocs)
      .select(col("doc_id").as("bench_doc"), xxhash64(col("shingle")).as("hm"))
      .distinct()
      .localCheckpoint(true)
    BenchIndex(sh, Text.bloomOf(sh.select(col("hm"))))
  }

  /** One batch's audit: the q67 kernel over (batch × benchmark) with the
    * q101 Bloom prefilter. Pure function of its inputs — no store read. */
  private[graft] def auditBatch(batch: DataFrame, bench: BenchIndex): DataFrame =
    Text.shinglesOf(batch)
      .select(col("doc_id").as("train_doc"), xxhash64(col("shingle")).as("hm"))
      .distinct()
      .filter(Text.mightContain(bench.bloom, col("hm")))
      .join(bench.shingles, Seq("hm"))
      .groupBy(col("train_doc"), col("bench_doc"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= Text.ContamMinShared)

  /** foreachBatch body: audit + replay-safe partitioned write. */
  private[graft] def processBatch(batch: DataFrame, bench: BenchIndex,
      auditDir: String, batchId: Long): Unit =
    auditBatch(batch, bench)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(auditDir)

  /** The accumulated audit (all batches). Schema-stable empty frame
    * when no batch has written yet OR every batch so far was clean (an
    * all-clean batch's dynamic overwrite leaves only `_SUCCESS`, no
    * footers — advisor r8; see [[StoreRead.hasParquetData]]). */
  def readAudit(spark: SparkSession, auditDir: String): DataFrame =
    if (!StoreRead.hasParquetData(spark, auditDir))
      spark.range(0).select(col("id").as("train_doc"),
        col("id").as("bench_doc"), col("id").as("n_shared"))
    else
      spark.read.parquet(auditDir)
        .select(col("train_doc"), col("bench_doc"), col("n_shared"))

  /** Wire a streaming (doc_id, text, …) train-doc source into the audit
    * loop against a fixed benchmark index. */
  def start(trainDocs: DataFrame, bench: BenchIndex,
      auditDir: String, checkpointDir: String): StreamingQuery =
    trainDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, bench, auditDir, batchId)
      }
      .start()
}
