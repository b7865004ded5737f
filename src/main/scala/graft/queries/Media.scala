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
}
