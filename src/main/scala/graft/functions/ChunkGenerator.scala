package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst `Generator` (the UDTF-equivalent extension point) that
  * flattens a token array into fixed-geometry chunks — one output row per
  * chunk: (chunk_idx, start_tok, n_chunk_tokens, chunk_text).
  *
  * Geometry is q54's exactly: chunks of `chunkLen` tokens every `stride`
  * tokens; a document of nt ≤ chunkLen tokens yields one chunk, otherwise
  * ceil((nt − chunkLen)/stride) + 1, so every token is covered and the
  * last chunk may run short. ExpressionSpec proves the generator
  * row-for-row equal to q54's built-in explode(sequence)+slice pipeline —
  * the same native-vs-spec discipline as CosineSimilarity/DotProductInt.
  *
  * Why a Generator when built-ins can express the flatten: this is the one
  * operator CLASS (table function) the inventory otherwise covers with
  * explode-composition; the generator form emits rows directly from eval —
  * no materialized per-row chunk-index array, no O(chunks) slice copies —
  * and is the seam a tokenizer-backed chunker (which cannot be an
  * expression composition) would plug into. Evaluation is CodegenFallback:
  * GenerateExec drives a non-codegen generator per row; the surrounding
  * projections stay in whole-stage codegen.
  *
  * Null contract: a NULL token array generates zero rows (explode's outer=
  * false semantics); null ELEMENTS are skipped in the joined text exactly
  * like q54's concat_ws (split() output never contains them).
  */
case class ChunkGenerator(child: Expression, chunkLen: Int, stride: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(chunkLen > 0 && stride > 0, "chunk geometry must be positive")

  override def prettyName: String = "chunk_gen"

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("start_tok", IntegerType, nullable = false),
    StructField("n_chunk_tokens", IntegerType, nullable = false),
    StructField("chunk_text", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val value = child.eval(input)
    if (value == null) return Nil
    val tokens = value.asInstanceOf[ArrayData]
    val nt = tokens.numElements()
    val k =
      if (nt > chunkLen) (nt - chunkLen + stride - 1) / stride + 1
      else 1
    // lazy iterator, not a materialized seq: GenerateExec pulls one chunk
    // row at a time, so a many-chunk document never buffers its whole
    // chunk set on the heap
    (0 until k).iterator.map { ci =>
      val start = ci * stride
      val end = math.min(start + chunkLen, nt)
      val sb = new java.lang.StringBuilder
      var i = start
      var firstTok = true
      while (i < end) {
        // concat_ws semantics: null elements contribute neither content
        // nor a separator (split() output never has them, but the spec
        // parity must hold on any input)
        if (!tokens.isNullAt(i)) {
          if (!firstTok) sb.append(' ')
          sb.append(tokens.getUTF8String(i).toString)
          firstTok = false
        }
        i += 1
      }
      InternalRow(ci, start, end - start, UTF8String.fromString(sb.toString))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
