package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch as a `TypedImperativeAggregate` — the
  * third native aggregate next to MinHashSig/SimHashSig, exercising the
  * MERGEABLE-SUMMARY class (Agarwal et al., "Mergeable Summaries",
  * PODS'12 — the property that makes a sketch partial-aggregation-safe):
  * each partition summarizes its token stream in m counters, partials
  * merge by pointwise sum + (m+1)-th-largest subtraction, and the
  * guarantees survive composition exactly as they do on one machine.
  *
  * Guarantees for a stream of N items with m counters:
  *   est(x) ≤ true(x) ≤ est(x) + N/(m+1)   for every item x, and
  *   every x with true(x) > N/(m+1) is present in the sketch.
  * At 100 TB this is the point: EXACT corpus token counts (q30) shuffle
  * the full token stream; the sketch ships m counters per partition —
  * constant state, one narrow merge tree, error bounded by N/(m+1).
  *
  * Misra-Gries update: tracked item → +1; room → insert at 1; full and
  * absent → decrement ALL counters by 1, dropping zeros (the classic
  * variant; the arriving item is NOT inserted). The decrement-all is an
  * EAGER O(m) sweep, amortized O(1) per stream element: each unit of
  * decrement cancels one previously added count unit, so total decrement
  * work is bounded by the stream length (see Buffer). An O(1)-per-miss
  * global-offset scheme exists but buys nothing here — m is a constant
  * 256 and the sweep is a flat hash-map pass.
  *
  * eval returns the surviving (token, est) pairs as an
  * array<struct<token,est>> sorted by (est DESC, token) — deterministic;
  * the caller slices its top-k. Output VALUES are engine-specific (the
  * sketch's eviction history depends on partitioning), so queries built
  * on this are declared no-oracle exactly like q53/q68, with the error
  * bound pinned against the exact q30 counts in LlmOpsSpec instead. */
case class FreqSketch(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketch.Buffer] {

  import FreqSketch.Buffer

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): Buffer = new Buffer(m)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = buf.mergeIn(other)

  override def eval(buf: Buffer): Any = {
    val rows = buf.entries
      .sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) =>
        InternalRow(UTF8String.fromString(t), Long.box(c)): Any }
    new GenericArrayData(rows.toArray)
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val es = buf.entries
    val payload = es.map { case (t, _) => t.getBytes(StandardCharsets.UTF_8) }
    val bb = ByteBuffer.allocate(4 + es.map(_ => 12).sum + payload.map(_.length).sum)
    bb.putInt(es.length)
    es.zip(payload).foreach { case ((_, c), tb) =>
      bb.putInt(tb.length); bb.put(tb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new Buffer(m)
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val tb = new Array[Byte](len); bb.get(tb)
      val c = bb.getLong()
      buf.put(new String(tb, StandardCharsets.UTF_8), c)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(child = newChildren.head)

  override def prettyName: String = "freq_sketch"
}

object FreqSketch {

  /** Mutable Misra-Gries state. The decrement-all on a full-and-absent
    * arrival is EAGER — O(m) per miss, but classically amortized O(1) per
    * stream element: every decrement removes one previously-added count
    * unit, so total decrement work ≤ total stream length. */
  final class Buffer(m: Int) {
    private val counts = mutable.HashMap.empty[String, Long]

    /** Live (token, count) pairs. */
    def entries: Seq[(String, Long)] = counts.toSeq

    /** Restore one entry (deserialize path — the buffer is fresh). */
    def put(token: String, count: Long): Unit = counts(token) = count

    def add(token: String): Unit =
      counts.get(token) match {
        case Some(c) => counts(token) = c + 1
        case None if counts.size < m => counts(token) = 1L
        case None => decrementAll(1L) // arriving item is NOT inserted (classic MG)
      }

    def mergeIn(other: Buffer): Buffer = {
      other.counts.foreach { case (t, c) =>
        counts(t) = counts.getOrElse(t, 0L) + c
      }
      // Agarwal et al. merge: if more than m entries survive the pointwise
      // sum, subtract the (m+1)-th largest count from all and drop the
      // non-positive — restores the size bound with total error still
      // bounded by N/(m+1) of the COMBINED stream.
      if (counts.size > m) {
        val kth = counts.valuesIterator.toArray.sorted(Ordering[Long].reverse)(m)
        decrementAll(kth)
      }
      this
    }

    private def decrementAll(d: Long): Unit =
      counts.keys.toArray.foreach { k => // snapshot: no mutation mid-iteration
        val nc = counts(k) - d
        if (nc <= 0) counts.remove(k) else counts(k) = nc
      }
  }
}
