package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Determinism helpers shared by every query (SURVEY.md §2.2 rules D1–D5).
  *
  * The correctness gate hash-compares Spark results against DuckDB, so all
  * inexact arithmetic must be bit-identical across engines:
  *
  *  - Per-row scalar double arithmetic is IEEE-deterministic and needs no
  *    help.
  *  - Aggregation order is NOT deterministic (partial aggs combine in
  *    shuffle order), so summed measures are cast to DECIMAL(18,4) first —
  *    exact, associative — and the final value cast back to DOUBLE. The
  *    testdata's monetary doubles are 2-decimal quantized, so the cast is
  *    exact; for free-form doubles the half-way tie is unreachable from a
  *    binary double at scale 4, so both engines round identically.
  *  - Averages are `exact_sum_as_double / count`: one IEEE division of
  *    identical operands, no cross-engine rounding involved.
  */
object Dsl {

  /** Default partition bound for [[pin]]: small enough that a pin's
    * materialization job and every downstream read of the pinned blocks
    * pays O(4) tasks instead of spark.sql.shuffle.partitions, large
    * enough that a multi-consumer read still overlaps I/O. */
  val PinParts = 4

  /** Eagerly pin a derived frame that multiple consumers re-read or that
    * self-joins: coalesce to a bounded partition count, `persist()`, and
    * materialize the WHOLE cache with a count before returning — every
    * consumer then reads one fully-built, immutable evaluation.
    *
    * Why eager-fill cache and not `localCheckpoint(true)` (the r9 sweep's
    * first form): the correctness hazard the sweep closed was a LAZY
    * cache first materialized mid-job serving an under-matched semi-join
    * on a cold session — the fix is that no consumer job ever observes a
    * partially-built pin, which the blocking count guarantees. The
    * checkpoint form paid ~2× on the audited hot paths (the r10 verdict's
    * quantified q99/q104/q77/q36 regression): it re-serializes every row
    * into storage blocks and cuts whole-stage codegen, where the cache
    * stores compressed columnar batches the scans read back natively.
    * Pinned frames here are deterministic SETS (aggregates/distinct
    * outputs), so even an evicted-and-recomputed partition (MEMORY_AND_
    * DISK spills first; recompute is the last resort) yields the same
    * rows. Iterative fixpoints must use [[pinIter]] instead — they need
    * the checkpoint's LINEAGE TRUNCATION, which a cache does not provide.
    *
    * `parts` is a LOCAL-MODE bound for frames proven bounded-cardinality;
    * a frame whose size scales with the corpus (e.g. a per-doc signature
    * table at 100 TB) should pass an explicit parts sized to keep
    * partitions under spark.sql.files.maxPartitionBytes. Unpersist is the
    * caller-contract documented on SparkEntry.clearGraftCaches. */
  def pin(df: DataFrame, parts: Int = PinParts): DataFrame = {
    val p = df.coalesce(parts).persist()
    p.count()
    p
  }

  /** Pin for ITERATIVE fixpoint rounds (CC label propagation, star
    * contraction): coalesce + eager `localCheckpoint` — the checkpoint
    * truncates lineage so round k's plan does not nest rounds 1..k-1
    * (the classic iterative-algorithm trap; a cache leaves the logical
    * plan growing per round and Catalyst re-analyzes the whole history).
    * Same partition bound and same blocking-materialization guarantee as
    * [[pin]]. */
  def pinIter(df: DataFrame, parts: Int = PinParts): DataFrame =
    df.coalesce(parts).localCheckpoint(true)

  /** Exact sum of a (possibly computed) double column: DECIMAL(18,4) per
    * row, decimal sum, DOUBLE out. DuckDB mirror:
    * `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`. */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,4)")).cast("double")

  /** Deterministic average: exact decimal sum divided by count in double.
    * DuckDB mirror: `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)`. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Round a double to 4 places for display-stable floats (cosine sims …).
    * Mirrored literally as ROUND(x, 4) in the oracle. */
  def round4(c: Column): Column = round(c, 4)

  /** ROUND(a/b, 4) for NONNEGATIVE integer columns (b > 0) in arithmetic
    * both engines perform identically: floor((a·20000 + b) / (2b)) / 10⁴
    * — the half-up quotient computed from exact integer operands, then one
    * exact division by 10⁴'s double. Spark's round() (BigDecimal HALF_UP)
    * and DuckDB's ROUND (floating) disagree on doubles sitting exactly on
    * a .00005 boundary, and integer ratios DO sit there (a/b = k/32 has a
    * 5 in the 5th decimal) — the q55 lesson, closed for ratios. The
    * operands stay exact in double up to a·20000 < 2⁵³ (a < 4.5·10¹¹ —
    * corpus-token-count scale; beyond that move the quotient to DECIMAL),
    * the quotient is correctly rounded from identical operands on both
    * engines, and floor of a correctly-rounded quotient cannot cross an
    * integer boundary because the true rational is ≥ 1/(2b) ≫ ½ulp away.
    * DuckDB mirror: FLOOR((a * 20000.0 + b) / (b * 2.0)) / 10000.0. */
  def ratio4(a: Column, b: Column): Column =
    floor((a.cast("double") * 20000.0 + b.cast("double")) / (b.cast("double") * 2.0)) / 10000.0

  /** [[ratio4]] for DECIMAL(38,0) operands past double's 2⁵³ window (the
    * escalation ratio4's scaladoc promises): the same half-up quotient
    * floor((a·20000 + b) / (2b)) computed with exact decimal arithmetic.
    * The numerator is modular-reduced FIRST so the one decimal division
    * is exactly divisible — Spark's decimal division rounds at the
    * result scale, and a rounded quotient sitting 1/(2b) < 10⁻ˢ below an
    * integer would make a naive floor() overshoot (the q55 boundary
    * class); an exact division cannot. The integral quotient is ≤ 2·10⁴
    * for a ≤ b (casts to double exactly), then one exact division by
    * 10⁴'s double — identical to ratio4 wherever both are exact, so the
    * oracle mirror is UNCHANGED. Exactness bound: a·20000 < 10³⁸
    * (a < 5·10³³); beyond that ANSI decimal overflow throws loudly. */
  def ratio4dec(a: Column, b: Column): Column = {
    val ad = a.cast("decimal(38,0)")
    val bd = b.cast("decimal(38,0)")
    val num = ad * lit(20000).cast("decimal(5,0)") + bd
    val den = bd * lit(2).cast("decimal(1,0)")
    ((num - pmod(num, den)) / den).cast("double") / 10000.0
  }

  /** Deterministic 60-bit content hash shared bit-for-bit with the DuckDB
    * oracle: first 15 hex chars of md5 over the UTF-8 bytes, parsed base-16.
    * DuckDB mirror: `('0x' || substr(md5(s), 1, 15))::BIGINT`. 60 bits keeps
    * every downstream product/mod inside exact signed-64 arithmetic in both
    * engines (DuckDB errors on BIGINT overflow; Spark wraps — neither is
    * allowed to happen). */
  def h60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Cosine similarity of two float-array columns: the native codegen'd
    * Catalyst expression (graft.functions.CosineSimilarity). Bit-identical
    * to [[cosineHof]] (asserted in ExpressionSpec) and to the oracle. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.CosineSimilarity(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** Integer dot product of two int-array columns: the native codegen'd
    * expression (graft.functions.DotProductInt) — exact LONG arithmetic,
    * order-independent, the ranking kernel of quantized ANN (q65). */
  def dotInt(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.DotProductInt(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** Sequential-fold dot product in double (native codegen'd
    * DotProductFold; float/double/long element types widen exactly) —
    * the LSH sign-test kernel. Bit-identical to
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` and DuckDB list_reduce. */
  def dotFold(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.DotProductFold(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** |A∩B| of two SORTED duplicate-free long-array columns: the native
    * codegen'd merge-count (graft.functions.SortedIntersectCount) — no
    * per-row hash set, no materialized intersection array. Equal to
    * `size(array_intersect(a, b))` on sorted-set inputs (ExpressionSpec);
    * callers own the precondition (derive inputs from array_sort over a
    * distinct stream). The exact near-dup verifiers' kernel (q36/q84/q99). */
  def sortedIntersectCount(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.SortedIntersectCount(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** Chunk-flatten a token-array column through the native Catalyst
    * Generator (graft.functions.ChunkGenerator) — one output row per
    * chunk: (chunk_idx, start_tok, n_chunk_tokens, chunk_text). Alias
    * with `.as(Seq(...))` like posexplode. Proven row-equal to q54's
    * explode(sequence)+slice composition in ExpressionSpec. */
  def chunkGen(tokens: Column, len: Int, stride: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.ChunkGenerator(
      GraftColumnBridge.expression(tokens), len, stride))
  }

  /** MinHash signature aggregate (native TypedImperativeAggregate,
    * graft.functions.MinHashSig): all K permutation minima updated in one
    * Array[Long] buffer per input row, vs the composed explode-K-rows +
    * grouped-MIN form it is proven equal to (ExpressionSpec). Coefficients
    * come from the caller (graft.queries.Dedup owns the sketch
    * constants). */
  def minhashSig(c: Column, a: Seq[Long], b: Seq[Long], p: Long): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.MinHashSig(
      GraftColumnBridge.expression(c), a, b, p).toAggregateExpression())
  }

  /** SimHash fingerprint aggregate (native TypedImperativeAggregate,
    * graft.functions.SimHashSig): per-bit ±1 tallies in one buffer per
    * token row, folded to the fingerprint at eval — vs the composed
    * explode-bits + two-SUM form it is proven equal to (ExpressionSpec). */
  def simhashSig(c: Column, bits: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.SimHashSig(
      GraftColumnBridge.expression(c), bits).toAggregateExpression())
  }

  /** Misra-Gries frequent-items sketch aggregate (native
    * TypedImperativeAggregate, graft.functions.FreqSketch): m counters
    * per partial, mergeable by pointwise sum + (m+1)-th-largest
    * subtraction; returns array<struct<token,est>> sorted (est DESC,
    * token). Values are engine-specific (eviction history depends on
    * partitioning) — queries built on this are no-oracle like q53/q68,
    * with the N/(m+1) error bound pinned vs exact counts in LlmOpsSpec. */
  def freqSketch(c: Column, m: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.FreqSketch(
      GraftColumnBridge.expression(c), m).toAggregateExpression())
  }

  /** HOF specification of [[dotInt]] — the interpreted form the native
    * expression is tested against (exact equality, ExpressionSpec). */
  def dotIntHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** The same cosine as a composition of built-in higher-order functions —
    * interpreted per element, kept as the executable specification the
    * native expression is tested against. Sequential fold from 0.0, same
    * order DuckDB's list arithmetic uses. */
  def cosineHof(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(
        zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0),
        (acc, v) => acc + v)
    def norm2(x: Column): Column =
      aggregate(x, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))
  }
}
