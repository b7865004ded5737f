package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}

/** Opaque-binary media processing plumbing (north-star multimodal columns).
  *
  * The contract a real pipeline needs from the engine:
  *  - media rows = (id, binary payload) with a typed feature struct out;
  *  - decode runs per-partition on executors (no driver collect, no
  *    per-row task overhead — one codec instance per partition);
  *  - the codec itself is a narrow seam (`bytes => MediaFeatures`) that a
  *    real image/audio library drops into.
  *
  * No media codec ships in this environment, so `decodeStub` is a
  * DETERMINISTIC FAKE: every field is a pure function of the bytes
  * (length, md5, hash-derived dimensions). The plumbing around it —
  * encoder schema, mapPartitions batching, partition-local codec reuse —
  * is real and tested (MediaSpec asserts it agrees with the codegen'd
  * expression pipeline in MediaQ.q43).
  */
object Media {

  case class MediaRow(doc_id: Long, content: Array[Byte])
  case class MediaFeatures(doc_id: Long, n_bytes: Int, content_md5: String,
      fake_width: Int, fake_height: Int)

  /** The codec seam. A real decoder (JPEG/PNG/audio frames) replaces this
    * body; the fake derives every feature deterministically from the bytes
    * so tests pin the plumbing without a codec. */
  def decodeStub(md: java.security.MessageDigest, id: Long, bytes: Array[Byte]): MediaFeatures = {
    md.reset()
    val digest = md.digest(bytes).map("%02x".format(_)).mkString
    // same salted-h60 scheme as MediaQ.q43: first 15 md5 hex chars, base 16
    def h60(salt: String): Long = {
      md.reset()
      val hex = md.digest((salt + new String(bytes, "UTF-8")).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    MediaFeatures(id, bytes.length, digest,
      (h60("w:") % 1920).toInt, (h60("h:") % 1080).toInt)
  }

  /** Per-partition decode: one MessageDigest (stand-in for one codec
    * instance) per partition, streamed over the iterator — the batch shape
    * a heavyweight decoder needs. */
  def extractFeatures(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map(r => decodeStub(md, r.doc_id, r.content))
    }.toDF()
  }
}
