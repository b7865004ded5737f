package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as ONE imperative aggregate — the
  * `TypedImperativeAggregate` extension class (SURVEY.md §7.3) next to the
  * scalar expressions, the Generator, and the as-of operator.
  *
  * For each input base hash x (the h60-mod-P shingle hash), updates all K
  * permutation minima m_i = min(m_i, (a_i·x + b_i) mod p) in a single
  * Array[Long] buffer — one buffer update per SHINGLE row, where the
  * composed form (explode K indices → grouped MIN) pushes K generated rows
  * per shingle through the hash aggregate. Min is commutative/associative
  * and duplicate-insensitive, so partial buffers merge elementwise in any
  * order and the result is bit-identical to the composed form (proven in
  * ExpressionSpec) and to the DuckDB oracle's unrolled arithmetic.
  *
  * The coefficient tables arrive as constructor parameters (provided by
  * graft.queries.Dedup, the single source of the MinHash constants), so
  * this expression stays a mechanism with no knowledge of the sketch
  * configuration. Products stay exact in signed-64 for a_i·x + b_i < 2⁶³
  * (the caller guarantees a_i < 2²⁷, x < p ≤ 2³¹).
  *
  * Buffer semantics: empty group → all-p sentinel components (p itself is
  * unreachable: every (a·x+b) mod p < p), matching "min over an empty set
  * is the identity"; groups exist only for docs with ≥ 1 shingle, exactly
  * like the composed form.
  */
case class MinHashSig(
    child: Expression,
    a: Seq[Long],
    b: Seq[Long],
    p: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val k = a.length
  require(b.length == k, "coefficient tables must align")

  // Hot-path coefficient tables as primitive arrays (r18, guide §1.2 "make
  // the code inside each stage fast"): the Seq[Long] constructor params are
  // Vectors — boxed elements behind an effectively-constant-but-slow
  // apply — and update() indexes them 2K times per shingle ROW (K = 64:
  // ~33M boxed lookups per sf0.1 signature build). Primitive arrays make
  // the K-loop all-unboxed; transient+lazy so the expression still
  // serializes through the Seq params untouched (bit-identical arithmetic).
  @transient private lazy val aArr: Array[Long] = a.toArray
  @transient private lazy val bArr: Array[Long] = b.toArray

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(p)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      val as = aArr
      val bs = bArr
      var i = 0
      while (i < k) {
        val h = (as(i) * x + bs(i)) % p
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    var i = 0
    while (i < k) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](k)
    var i = 0
    while (i < k) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSig =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSig =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSig =
    copy(child = newChildren.head)

  override def prettyName: String = "minhash_sig"
}
