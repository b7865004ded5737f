package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Dsl._
import graft.tables.Tables

/** Multimodal-column plumbing: media (image/audio/video) as opaque
  * `binary` columns with typed metadata, processed without ever
  * interpreting the bytes on the driver.
  *
  * No binary media ships in the testdata, so `documents.text` cast to its
  * UTF-8 bytes stands in for the payload; the codec stage is a
  * deterministic fake (graft.ops.Media.decodeStub) because no image/audio
  * libraries exist in this environment — the Spark-side contract (binary
  * column in, fixed-schema feature struct out, per-partition batching,
  * no driver collect) is the real, tested part, and is what a genuine
  * decoder would drop into.
  */
object MediaQ {

  /** q43: binary feature-extraction pipeline over the stand-in payloads:
    * byte length, content digest, fake decoded dimensions (pure functions
    * of the bytes — the stub codec), and a digest of the leading 64-byte
    * "frame sample". Every stage is a codegen'd expression on the binary
    * column; the same shapes (slice, digest, length) are what real
    * frame-sampling produces. */
  def q43(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("text").cast("binary").as("content"))
      .select(
        col("doc_id"),
        length(col("content")).as("n_bytes"),
        md5(col("content")).as("content_md5"),
        (h60(concat(lit("w:"), col("text"))) % 1920).cast("int").as("fake_width"),
        (h60(concat(lit("h:"), col("text"))) % 1080).cast("int").as("fake_height"),
        // "frame sample": leading 64 characters (chars, not bytes — char
        // slicing is what DuckDB's substr does, and it never splits a
        // UTF-8 codepoint)
        md5(substring(col("text"), 1, 64).cast("binary")).as("frame_md5"))
      .orderBy(col("doc_id"))

  /** q176 samples per media item. */
  val FrameSamples = 4

  /** q176: the FRAME-SAMPLING PLAN — the metadata→index→pointed-read
    * pipeline a video/audio curation job runs BEFORE any decode: derive
    * per-item metadata (duration, fps — here deterministic stubs: 1
    * stand-in char ≡ 1 ms, fps = 24 + doc_id mod 6), compute the total
    * frame count, pick [[FrameSamples]] uniformly-spaced frame indices by
    * the midpoint rule (frame_j = ⌊total·(2j+1)/2K⌋ — never out of
    * range), and perform one POINTED read per sampled frame (a digest of
    * the 16-char slice at the frame's derived offset — the
    * seek-and-decode shape, never a full-payload scan per frame). Items
    * too short to hold a frame are absent, not zero-padded.
    *
    * All index arithmetic is exact integers; the reads are codegen'd
    * expressions on the payload column (q43's contract: no driver
    * collect, no UDF). At 100 TB the plan stage is a pure map — no
    * shuffle anywhere — and the explode fan-out is the constant K. */
  def q176(spark: SparkSession, sfDir: String): DataFrame =
    frameSamplePlan(Tables.documents(spark, sfDir))

  /** q176 kernel on a (doc_id, text) frame (planted-data seam). */
  private[graft] def frameSamplePlan(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"),
        length(col("text")).as("n_chars"),
        length(col("text")).cast("long").as("duration_ms"),
        // pmod mirrored in the oracle as (doc_id % 6 + 6) % 6 so negative
        // ids read the same fps on both engines (advisor r14)
        (lit(24L) + pmod(col("doc_id"), lit(6L))).as("fps"))
      .withColumn("total_frames", expr("duration_ms * fps div 1000"))
      .filter(col("total_frames") > 0)
      .withColumn("j", explode(sequence(lit(0), lit(FrameSamples - 1))))
      .withColumn("frame_idx",
        expr(s"total_frames * (2 * j + 1) div ${2 * FrameSamples}"))
      .withColumn("off",
        pmod(col("frame_idx"), greatest(lit(1L), col("n_chars") - 15)) + 1)
      .select(col("doc_id"), col("j").as("sample_j"), col("fps"),
        col("total_frames"), col("frame_idx"),
        md5(expr("substring(text, cast(off as int), 16)").cast("binary"))
          .as("frame_md5"))
      .orderBy(col("doc_id"), col("sample_j"))
}
