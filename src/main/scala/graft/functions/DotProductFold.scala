package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native sequential-fold dot product in DOUBLE over two numeric-vector
  * columns — the projection kernel of the hyperplane-LSH sign tests
  * (graft.ops.Ann: 32 planes × 64 components per vector for q37/q38
  * bucket assignment).
  *
  * Each side may independently be ARRAY<FLOAT>, ARRAY<DOUBLE> or
  * ARRAY<BIGINT>; elements widen EXACTLY to double (the plane weights are
  * small integers, |w| ≤ 4) before one left-to-right accumulation from
  * 0.0 — bit-identical to the HOF spec
  * `aggregate(zip_with(a, b, (x, w) -> x*w), 0.0, +)` and to DuckDB's
  * list_reduce fold, which is what keeps every bucket id engine-exact.
  * Input types are checked here rather than via ExpectsInputTypes so no
  * implicit (lossy) cast is ever inserted. Difference from the HOF form
  * is execution only: whole-stage codegen instead of ~2·dim interpreted
  * lambda calls per plane.
  *
  * Null contract as DotProductInt/CosineSimilarity: mismatched lengths or
  * a null element yield NULL (zip_with null-pads, the null poisons the
  * fold), hence the nullable=true override.
  */
case class DotProductFold(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okElem(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) | ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okElem(left.dataType) && okElem(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE|BIGINT> on each side, " +
        s"got ${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_fold"
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val xt = elemType(left)
    val yt = elemType(right)
    def get(arr: ArrayData, t: DataType, i: Int): Double = t match {
      case FloatType => arr.getFloat(i).toDouble
      case LongType  => arr.getLong(i).toDouble
      case _         => arr.getDouble(i)
    }
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += get(x, xt, i) * get(y, yt, i)
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
      def get(arr: String, e: Expression): String = elemType(e) match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case LongType  => s"(double) $arr.getLong($i)"
        case _         => s"$arr.getDouble($i)"
      }
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = ($b.numElements() != $n);
         |double $dot = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; }
         |  else { $dot += ${get(a, left)} * ${get(b, right)}; }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $dot; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
