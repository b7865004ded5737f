package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine similarity over two numeric-vector columns — the custom
  * Catalyst Expression for the engine's hottest scalar (q31/q37/q38 rank
  * every candidate by it; q55/q56's Lloyd's assignment runs it
  * |corpus|×|cells| times per round).
  *
  * Each side may independently be ARRAY<FLOAT> or ARRAY<DOUBLE> — floats
  * widen exactly to double before any arithmetic, so a float embedding
  * against a double centroid computes on exactly the values the
  * higher-order-function spec (and DuckDB) sees. No implicit cast is ever
  * inserted (the double side would otherwise be LOSSILY narrowed to
  * float, breaking fold parity), which is why this checks input types
  * itself instead of letting ExpectsInputTypes cast.
  *
  * Semantically identical, bit-for-bit, to the higher-order-function
  * composition in graft.ops.Dsl.cosineHof (and therefore to the DuckDB
  * oracle): one sequential left-to-right pass accumulating dot product and
  * both norms in double starting from 0.0, then dot / (√na · √nb) — the
  * same operations in the same order, so results are interchangeable.
  * The difference is execution: HOF lambdas are interpreted per element,
  * while this expression participates in whole-stage codegen — the
  * generated loop below runs fused inside the surrounding operator.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okElem(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okElem(left.dataType) && okElem(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> or ARRAY<DOUBLE> on each side, " +
        s"got ${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  // nullable even when both children are non-null: mismatched lengths and
  // null ELEMENTS produce null (see DotProductInt — without the override
  // the result is declared non-null and the null bit is dropped).
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Mismatched lengths or a null element yield NULL — matching the HOF
    * spec (zip_with null-pads the shorter side; a null product poisons the
    * fold, and null/x stays null), and guarding the SQL-registered form
    * against unchecked UnsafeArrayData reads past the shorter array. */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val xf = isFloat(left)
    val yf = isFloat(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val bad = ctx.freshName("bad")
      def get(arr: String, e: Expression): String =
        if (isFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = ($b.numElements() != $n);
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; }
         |  else {
         |    final double $xi = ${get(a, left)};
         |    final double $yi = ${get(b, right)};
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; }
         |else { ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
