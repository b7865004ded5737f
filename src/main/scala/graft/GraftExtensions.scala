package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{ChunkGenerator, CosineSimilarity, DotProductFold, DotProductInt, FreqSketch, MinHashSig, SimHashSig, SortedIntersectCount}

/** Engine extensions, installed with
  * `spark.sql.extensions=graft.GraftExtensions`: registers the native
  * functions so they're first-class in SQL text (`SELECT cosine_sim(a, b)`)
  * as well as through the Column API (graft.ops.Dsl.cosine).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSim)
    ext.injectFunction(GraftExtensions.dotInt)
    ext.injectFunction(GraftExtensions.dotFold)
    ext.injectFunction(GraftExtensions.chunkGen)
    ext.injectFunction(GraftExtensions.minhashSig)
    ext.injectFunction(GraftExtensions.simhashSig)
    ext.injectFunction(GraftExtensions.freqSketch)
    ext.injectFunction(GraftExtensions.sortedIntersectCount)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
  }
}

object GraftExtensions {
  private val cosineSim = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 2, "cosine_sim takes exactly 2 arguments")
      CosineSimilarity(children.head, children(1)): org.apache.spark.sql.catalyst.expressions.Expression
    })

  private val dotInt = (
    FunctionIdentifier("dot_int"),
    new ExpressionInfo(classOf[DotProductInt].getName, "dot_int"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 2, "dot_int takes exactly 2 arguments")
      DotProductInt(children.head, children(1)): org.apache.spark.sql.catalyst.expressions.Expression
    })

  private val dotFold = (
    FunctionIdentifier("dot_fold"),
    new ExpressionInfo(classOf[DotProductFold].getName, "dot_fold"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 2, "dot_fold takes exactly 2 arguments")
      DotProductFold(children.head, children(1)): org.apache.spark.sql.catalyst.expressions.Expression
    })

  /** chunk_gen(tokens, len, stride) — the generator (UDTF) form; len and
    * stride must be INT literals (generator geometry is plan-time). */
  private val chunkGen = (
    FunctionIdentifier("chunk_gen"),
    new ExpressionInfo(classOf[ChunkGenerator].getName, "chunk_gen"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 3, "chunk_gen takes exactly 3 arguments")
      def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression, name: String): Int =
        e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
          case _ => throw new IllegalArgumentException(s"chunk_gen: $name must be an INT literal")
        }
      ChunkGenerator(children.head,
        intLit(children(1), "len"),
        intLit(children(2), "stride")): org.apache.spark.sql.catalyst.expressions.Expression
    })

  /** minhash_sig(hm) — the MinHash-signature TypedImperativeAggregate at
    * the engine's sketch configuration (graft.queries.Dedup owns the
    * constants); the analyzer wraps the returned AggregateFunction. */
  private val minhashSig = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 1, "minhash_sig takes exactly 1 argument")
      import graft.queries.Dedup
      MinHashSig(children.head,
        (0 until Dedup.K).map(Dedup.aCoef),
        (0 until Dedup.K).map(Dedup.bCoef),
        Dedup.P): org.apache.spark.sql.catalyst.expressions.Expression
    })

  /** simhash_sig(hm) — the SimHash-fingerprint TypedImperativeAggregate
    * at the engine's bit width (graft.queries.Dedup.SimBits). */
  private val simhashSig = (
    FunctionIdentifier("simhash_sig"),
    new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 1, "simhash_sig takes exactly 1 argument")
      SimHashSig(children.head, graft.queries.Dedup.SimBits):
        org.apache.spark.sql.catalyst.expressions.Expression
    })

  /** freq_sketch(token) — the Misra-Gries frequent-items
    * TypedImperativeAggregate at the engine's counter budget
    * (graft.queries.Text.HhCounters). */
  private val freqSketch = (
    FunctionIdentifier("freq_sketch"),
    new ExpressionInfo(classOf[FreqSketch].getName, "freq_sketch"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 1, "freq_sketch takes exactly 1 argument")
      FreqSketch(children.head, graft.queries.Text.HhCounters):
        org.apache.spark.sql.catalyst.expressions.Expression
    })

  /** sorted_intersect_count(a, b) — merge-count of two sorted
    * duplicate-free long arrays (the exact near-dup verification kernel). */
  private val sortedIntersectCount = (
    FunctionIdentifier("sorted_intersect_count"),
    new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 2, "sorted_intersect_count takes exactly 2 arguments")
      SortedIntersectCount(children.head, children(1)): org.apache.spark.sql.catalyst.expressions.Expression
    })

  /** Imperative registration into an already-built session (the config
    * route only applies to sessions created with
    * `spark.sql.extensions=graft.GraftExtensions`). Also installs the
    * as-of planner strategy (graft.ops.AsOf.install does the same on
    * demand). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      cosineSim._1, cosineSim._2, cosineSim._3)
    spark.sessionState.functionRegistry.registerFunction(
      dotInt._1, dotInt._2, dotInt._3)
    spark.sessionState.functionRegistry.registerFunction(
      dotFold._1, dotFold._2, dotFold._3)
    spark.sessionState.functionRegistry.registerFunction(
      chunkGen._1, chunkGen._2, chunkGen._3)
    spark.sessionState.functionRegistry.registerFunction(
      minhashSig._1, minhashSig._2, minhashSig._3)
    spark.sessionState.functionRegistry.registerFunction(
      simhashSig._1, simhashSig._2, simhashSig._3)
    spark.sessionState.functionRegistry.registerFunction(
      freqSketch._1, freqSketch._2, freqSketch._3)
    spark.sessionState.functionRegistry.registerFunction(
      sortedIntersectCount._1, sortedIntersectCount._2, sortedIntersectCount._3)
    graft.ops.AsOf.install(spark)
  }
}
