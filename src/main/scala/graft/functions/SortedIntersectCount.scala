package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native |A∩B| over two SORTED long-array sets — the verification kernel
  * of the exact near-dup family (q36 Jaccard, q84 containment, q99's truth
  * build). Exploits what the general-purpose `array_intersect` cannot
  * assume: both inputs are sorted ascending (array_sort order — nulls
  * last) and duplicate-free, so the count is one allocation-free two-
  * pointer merge instead of a per-row hash set build plus a materialized
  * intersection array that only ever feeds `size(...)`. When the sides
  * are length-skewed (q84's small-doc-in-large-doc shape) the trailing
  * pointer GALLOPS: exponential probe doubling from the current position,
  * then a binary search inside the last octave — O(min log(max/min))
  * instead of O(max) for the disjoint stretches.
  *
  * Semantics (asserted == size(array_intersect(a,b)) on sorted-set inputs
  * in ExpressionSpec): count of values present in both arrays, a shared
  * null element counting once (array_intersect keeps one null when both
  * sides hold one; with array_sort order any nulls form the tail, so the
  * merge stops at the first null and the shared-null check reads the last
  * slot of each side). Inputs that violate the precondition (unsorted or
  * duplicated values) are a CALLER BUG — the count is then undefined,
  * which is why the producers in Text.scala derive every input from
  * array_sort over a distinct stream. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  /** Codegen: one static call per row into [[SortedIntersectCount.count]] —
    * the loop body stays in compiled Scala (monomorphic, JIT-inlined), and
    * the generated class only carries the call, unlike array_intersect's
    * per-row OpenHashSet build. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectCount.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Galloping advance: smallest index k in [lo, n) with a.getLong(k) >= y,
    * assuming a[lo-1] < y and a sorted ascending with any nulls at the
    * tail (a null slot terminates the comparable range, so it bounds the
    * gallop exactly like the array end). */
  private def gallop(a: ArrayData, lo0: Int, n: Int, y: Long): Int = {
    var lo = lo0
    var step = 1
    // exponential probe: find an octave [lo, hi) with a[hi] >= y (or hi = n)
    var hi = lo + step
    while (hi < n && !a.isNullAt(hi) && a.getLong(hi) < y) {
      lo = hi + 1
      step <<= 1
      hi = lo0 + step
    }
    if (hi > n) hi = n
    // binary search inside [lo, hi); a null slot compares as +infinity
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (!a.isNullAt(mid) && a.getLong(mid) < y) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Threshold below which the two-pointer merge advances linearly — short
    * gaps (the heavily-overlapping near-dup case) are cheaper stepped than
    * probed. */
  private val GallopAfter = 8

  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var cnt = 0L
    var run = 0 // consecutive advances on one side since the last match
    var lastSide = 0
    var done = false
    while (!done && i < na && j < nb) {
      if (a.isNullAt(i) || b.isNullAt(j)) done = true // nulls are the sorted tail
      else {
        val x = a.getLong(i)
        val y = b.getLong(j)
        if (x == y) { cnt += 1; i += 1; j += 1; run = 0 }
        else if (x < y) {
          if (lastSide == 1) run += 1 else { lastSide = 1; run = 1 }
          if (run >= GallopAfter) { i = gallop(a, i + 1, na, y); run = 0 }
          else i += 1
        } else {
          if (lastSide == 2) run += 1 else { lastSide = 2; run = 1 }
          if (run >= GallopAfter) { j = gallop(b, j + 1, nb, x); run = 0 }
          else j += 1
        }
      }
    }
    // a null present on BOTH sides intersects once (array_intersect keeps
    // one null); sorted order puts any null in the last slot
    if (na > 0 && nb > 0 && a.isNullAt(na - 1) && b.isNullAt(nb - 1)) cnt += 1
    cnt
  }
}
