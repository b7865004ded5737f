package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Candidate generators for sub-quadratic similarity search — the 100 TB
  * path next to the exact baselines (q31 brute-force cosine, q36 exact
  * Jaccard). Random-hyperplane LSH for cosine (Charikar, STOC'02) with
  * OR-amplification: L independent hash tables of k sign bits each; a
  * vector is a candidate if it shares ANY table's bucket with the query.
  * P(candidate) = 1 - (1 - p^k)^L where p = 1 - θ/π, so near vectors are
  * recalled with high probability while far ones mostly stay out, and the
  * search is L hash-bucket lookups (a broadcast of one query row + equi
  * join) — never a shuffled cartesian. k=4/L=8 suits the testdata's
  * near-neighbor range (max cosine ≈ 0.45 → p ≈ 0.65 → per-table 0.18,
  * overall ≈ 0.80 recall for the top hit); denser corpora raise k.
  *
  * The planes are fixed integer weights from a seeded LCG, embedded as
  * literals in BOTH the Spark plan and the DuckDB oracle SQL, which makes
  * every bucket assignment (an exact-arithmetic sign test: float×int
  * products are exact in double, summed sequentially in the same order by
  * both engines) bit-deterministic across engines.
  */
object Ann {

  val Tables = 8       // L hash tables
  val BitsPerTable = 4 // k sign bits per table
  val Planes = Tables * BitsPerTable
  val Dim = 64

  /** Widest k the scale path can request (k = 4 + log2(density) covers
    * density amplification up to 2^8 = 256× before running out). */
  val MaxBitsPerTable = 12

  /** Fixed hyperplane weights in [-4, 4]: LCG (Knuth MMIX constants), seed
    * 42 — deterministic, dependency-free, and identical wherever the table
    * is rebuilt (Scala here, string-literal lists in OracleSql). The first
    * [[Planes]] planes are the production family mirrored into the oracle;
    * the tail (up to Tables × MaxBitsPerTable) extends the SAME LCG stream
    * for [[bucketsWide]] — the prefix never changes when the tail grows. */
  private val allWeights: Array[Array[Long]] = {
    var state = 42L
    Array.fill(Tables * MaxBitsPerTable, Dim) {
      state = state * 6364136223846793005L + 1442695040888963407L
      ((state >>> 33) % 9) - 4
    }
  }
  val weights: Array[Array[Long]] = allWeights.take(Planes)

  /** Each plane as ONE Literal node of ArrayType(Long) — `typedLit` carries
    * the 64 weights as constant ArrayData instead of a 64-node
    * expression subtree, so the 32-plane bucket expression holds 32 literal
    * nodes, not 2048. (r2 profile: q38's cold−warm delta was seconds of
    * driver-side plan/codegen dominated by the literal fan-out; the values,
    * and hence the oracle mirror, are unchanged.) */
  private val planeLits: IndexedSeq[Column] =
    (0 until Planes).map(p => typedLit(weights(p).toSeq))

  /** Signed projection of an embedding onto plane `p`: sequential
    * left-fold in double (matches DuckDB list_reduce order), through the
    * native codegen'd DotProductFold — bit-identical to the HOF
    * `aggregate(zip_with(…), 0.0, +)` spec (ExpressionSpec), but the
    * 32-plane × 64-component bucket computation runs fused in whole-stage
    * codegen instead of ~4096 interpreted lambda calls per vector. */
  private def dotPlane(emb: Column, p: Int): Column =
    graft.ops.Dsl.dotFold(emb, planeLits(p))

  /** k-bit bucket id of an embedding in hash table `t` (planes
    * t·k .. t·k+k-1): bit j set iff that plane's projection is > 0. */
  def bucket(emb: Column, t: Int): Column =
    (0 until BitsPerTable)
      .map(j => when(dotPlane(emb, t * BitsPerTable + j) > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** All L table buckets as an array column (index = table id). */
  def buckets(emb: Column): Column =
    array((0 until Tables).map(t => bucket(emb, t)): _*)

  /** The density knob the scaladoc's "denser corpora raise k" names, as a
    * bucket family: L tables of `bits` sign bits each, planes drawn from
    * the extended LCG stream (table t uses planes t·bits .. t·bits+bits−1,
    * so bits = [[BitsPerTable]] reproduces [[buckets]] exactly — same
    * planes, same order). Expected bucket occupancy halves per extra bit:
    * a corpus N× denser than the tuning point runs bits + log2(N) to keep
    * per-bucket candidate volume — and hence the LSH join's output — at
    * the design density. Collision probability for near pairs falls as
    * p^bits per table (OR-amplified across L), the standard k/L trade.
    * No oracle mirrors the wide family (it exists for the scale
    * rehearsal, not the declared inventory); its planes are literals from
    * the same generator, so a future oracle could. */
  def bucketsWide(emb: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= MaxBitsPerTable, s"bits=$bits out of range")
    def wideBucket(t: Int): Column =
      (0 until bits)
        .map { j =>
          val p = typedLit(allWeights(t * bits + j).toSeq)
          when(graft.ops.Dsl.dotFold(emb, p) > 0, lit(1L << j)).otherwise(lit(0L))
        }
        .reduce(_ + _)
    array((0 until Tables).map(wideBucket): _*)
  }

  /** Raw (pre-sign) projection onto plane `p` — q85's JL component. The
    * LSH bucket bits above are exactly the SIGNS of these projections, so
    * the reduced-space geometry and the bucket structure come from one
    * plane family and cannot drift apart. */
  def projection(emb: Column, p: Int): Column = dotPlane(emb, p)
}
