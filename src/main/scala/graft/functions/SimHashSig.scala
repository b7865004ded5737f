package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash fingerprint as one imperative aggregate (MinHashSig's sibling):
  * per input token hash x, every bit position j tallies +1 if bit j of x
  * is set, −1 otherwise, all `bits` tallies in a single Array[Long]
  * buffer; eval folds the tallies into the fingerprint (bit j set iff
  * tally_j > 0). One buffer update per TOKEN row, where the composed form
  * (explode `bits` positions → grouped ±1 SUM → second fold SUM) pushes
  * `bits` generated rows per token through two hash aggregates. Sums are
  * exact integers — commutative, order-free — so partial buffers merge in
  * any order and the fingerprint is bit-identical to the composed form
  * (ExpressionSpec) and to the oracle's unrolled SUM(CASE) arithmetic.
  *
  * Empty-group semantics match the composed form trivially (groups exist
  * only for docs with ≥ 1 token); an all-zero tally vector (impossible
  * for odd input counts) would fold to fingerprint 0 on both forms —
  * `tally > 0` on both sides.
  */
case class SimHashSig(
    child: Expression,
    bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(bits > 0 && bits <= 63, "bits must fit a signed-64 fingerprint")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var j = 0
      while (j < bits) {
        buf(j) += (if (((x >>> j) & 1L) == 1L) 1L else -1L)
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < bits) { buf(j) += other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    var h = 0L
    var j = 0
    while (j < bits) {
      if (buf(j) > 0) h |= 1L << j
      j += 1
    }
    h
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * bits)
    var j = 0
    while (j < bits) { bb.putLong(buf(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bits)
    var j = 0
    while (j < bits) { buf(j) = bb.getLong(); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashSig =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashSig =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashSig =
    copy(child = newChildren.head)

  override def prettyName: String = "simhash_sig"
}
