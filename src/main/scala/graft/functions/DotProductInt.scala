package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native integer dot product over two int-vector columns — the ranking
  * kernel of quantized ANN (q65): once embeddings are scalar-quantized to
  * int8 (q59/q65), candidate ranking is pure integer arithmetic, which is
  * exact (no float-order discipline needed — any evaluation order gives
  * the same LONG), deterministic across engines, and the reason production
  * vector stores (FAISS SQ, ScaNN) quantize at all.
  *
  * Semantically identical to the HOF specification graft.ops.Dsl.dotIntHof
  * (asserted exactly in ExpressionSpec); the difference is execution — this
  * loop participates in whole-stage codegen instead of interpreting two
  * lambdas per element.
  */
case class DotProductInt(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_int"
  // nullable even when both children are non-null: mismatched lengths and
  // null ELEMENTS produce null. Without this override the default
  // (children-derived) nullability declares the result non-null and the
  // engine drops the null bit entirely (reading garbage 0).
  override def nullable: Boolean = true

  /** Mismatched lengths or a null element yield NULL — the exact semantics
    * of the HOF spec (zip_with pads the shorter side with nulls and the
    * null product poisons the fold), and the only safe behavior for the
    * SQL-registered form, where callers control the inputs (indexing past
    * an UnsafeArrayData end is an unchecked read). */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var dot = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getInt(i).toLong * y.getInt(i).toLong
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = ($b.numElements() != $n);
         |long $dot = 0L;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; }
         |  else { $dot += (long) $a.getInt($i) * (long) $b.getInt($i); }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $dot; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
