package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Data-layout operators (SURVEY.md §2.2 q149): Z-order (Morton)
  * clustering keys and the min/max-pruning audit they exist to serve —
  * the OPTIMIZE-ZORDER layout step every 100 TB lakehouse table runs so
  * that MULTI-dimensional predicates prune files. A single-dimension sort
  * layout prunes scans on its sort key only; interleaving the bits of two
  * dimensions bounds every bucket in BOTH dimensions at once, so a
  * rectangle predicate (and each single-dimension slice of it) skips the
  * buckets whose [min,max] envelope misses it.
  *
  * Reference tie: the reference engine stores its projections id-keyed
  * in MySQL (consumer/consumer.go:186-206 — `INSERT INTO events (id, …)`
  * / `payment_promises` / `member_bills`, each clustered on the single
  * insert key) — the layout this operator generalizes: Z-order is what
  * replaces single-key clustering when queries also carve on time.
  */
object ZOrder {

  /** Morton dims are min-max quantized to 16 bits each (the interleaved
    * key fits 32). Quantizing to the DATA's domain — not masking raw
    * values — is what makes the key's high bits informative: raw custkeys
    * and epoch days occupy only the low bits of a 16-bit word, so a
    * top-bits bucket split of unquantized dims collapses to one bucket
    * (measured: 1 non-empty bucket at sf0.001). Production OPTIMIZE
    * ZORDER does the same normalization via per-column range stats. */
  val ZDimBits = 16

  /** The quantized domain maximum, (1 << ZDimBits) − 1. */
  val ZDimMax = (1L << ZDimBits) - 1

  /** Bucket = top [[ZBucketBits]] bits of the 32-bit key → 64 buckets,
    * the "file" granularity of the audit (a lakehouse table's file count
    * scales with data; the AUDIT's cardinality is always bucket-bounded,
    * so the query output never grows with the corpus). */
  val ZBucketBits = 6

  /** The fixed audit rectangle: customers 0–63 × order dates in 1997
    * (epoch days [[RectDayLo]]..[[RectDayHi]]). Chosen to slice BOTH
    * dimensions so the law can show pruning on each. */
  val RectCkLo = 0L
  val RectCkHi = 63L
  val RectDayLo: Long = java.time.LocalDate.of(1997, 1, 1).toEpochDay
  val RectDayHi: Long = java.time.LocalDate.of(1997, 12, 31).toEpochDay

  /** Spread the low 16 bits of `c` to the even bit positions of a 32-bit
    * word (the classic mask-shift Morton ladder — pure codegen'd integer
    * Column ops, no UDF). */
  private[graft] def spread16(c: Column): Column = {
    val v0 = c.bitwiseAND(lit(0xFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** The 32-bit Morton interleave of two 16-bit dims (x on even bits, y
    * on odd). */
  private[graft] def morton32(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Min-max quantization of `v` from [lo, hi] onto [0, [[ZDimMax]]] in
    * EXACT integer arithmetic: floor((v−lo)·ZDimMax / (hi−lo)) via the
    * ratio4dec mod-reduction (the numerator is made exactly divisible, so
    * the one double division is exact — both operands stay well under
    * 2^53 for any key the amplifier produces). A degenerate domain
    * (hi = lo) maps everything to 0. */
  private[graft] def quant16(v: Column, lo: Column, hi: Column): Column = {
    val span = greatest(hi - lo, lit(1L))
    val num = (v - lo) * lit(ZDimMax)
    ((num - pmod(num, span)) / span).cast("long")
  }

  /** q149: Z-order layout audit over `orders` — each row's clustering key
    * is the Morton interleave of (o_custkey, epoch-day(o_orderdate));
    * rows land in the bucket addressed by the key's top [[ZBucketBits]]
    * bits (a pure map-side assignment — a real table write would range-
    * split the sorted key instead, but the TOP-BITS split IS a contiguous
    * Z-range split, just equi-width rather than equi-depth). Output, per
    * non-empty bucket: row count, the min/max envelope of BOTH dims —
    * the file-skipping metadata a lakehouse scan planner reads — and
    * `would_scan`, whether the fixed audit rectangle intersects the
    * envelope. Deterministic integer arithmetic end to end; the DuckDB
    * oracle mirrors the mask-shift ladder literally.
    *
    * Scale posture: the key is map-side integer arithmetic inside one
    * whole-stage span under a single-row broadcast (the domain stats —
    * one map-side-combined reduce; a lakehouse deployment reads these
    * from table-level column stats instead of a scan); the ONLY shuffle
    * is the groupBy(bucket) at 2^[[ZBucketBits]] cardinality (map-side
    * combined, so each task emits ≤ 64 partial rows no matter how many
    * billions it scanned); the audit output is bucket-bounded. At 100 TB
    * this is the cheapest full-scan shape an engine has — and it's the
    * query you run ONCE to decide a layout that then prunes every later
    * scan. */
  /** q150: compaction target — merge groups aim at this many rows (the
    * row-count proxy for a lakehouse's target file size). With
    * 2^[[ZBucketBits]] buckets the plan can never exceed 64 groups, so
    * the output is bucket-bounded at any corpus size. */
  val CompactTargetRows = 4000L

  /** q150: COMPACTION PLAN over the q149 layout — the second half of
    * OPTIMIZE: given the per-bucket row counts IN Z-range order (so
    * merging neighbors preserves the clustering q149 built), split the
    * ordered bucket stream into contiguous merge groups of
    * ~[[CompactTargetRows]] rows each: group = floor(running-rows-before
    * / target), the standard size-based split of an ordered file stream.
    * Output per merge group: bucket span, bucket count, total rows, and
    * whether the group hits the target (the last group may be a
    * remainder). Exact integer arithmetic throughout (the floor is the
    * mod-reduced exact division).
    *
    * Scale posture: everything after q149's 64-row aggregate runs on a
    * bucket-bounded frame — the cumulative window is global but sits on
    * a ≤ 64-row post-aggregate frame (bounded-global-window allowlist);
    * the real work is q149's single map-side-combined shuffle. */
  def q150(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val buckets = q149(spark, sfDir).select(col("bucket"), col("n"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val before = coalesce(sum(col("n")).over(w), lit(0L))
    val num = before - pmod(before, lit(CompactTargetRows))
    buckets
      .withColumn("grp", (num / lit(CompactTargetRows)).cast("long"))
      .groupBy(col("grp"))
      .agg(min(col("bucket")).as("first_bucket"),
        max(col("bucket")).as("last_bucket"),
        count(lit(1)).as("n_buckets"),
        sum(col("n")).as("total_rows"))
      .withColumn("at_target", col("total_rows") >= CompactTargetRows)
      .orderBy(col("grp"))
  }

  def q149(spark: SparkSession, sfDir: String): DataFrame = {
    val o = ordersDims(spark, sfDir)
    envelopes(bucketed(o, domainOf(o))).orderBy(col("bucket"))
  }

  /** The two Morton dims of the orders table: (ck, day). */
  private[graft] def ordersDims(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir).select(
      col("o_custkey").as("ck"),
      datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))

  /** Per-dim domain stats: one single-row aggregate, broadcast into the
    * scan (the q74/q80 one-row-BNLJ pattern — allowlisted in PlanSpec).
    * A streaming maintainer (s33) passes a FIXED offline domain here
    * instead — batch-local domains would shift bucket assignment batch
    * to batch. */
  private[graft] def domainOf(o: DataFrame): DataFrame =
    o.agg(
      min(col("ck")).as("lo_ck"), max(col("ck")).as("hi_ck"),
      min(col("day")).as("lo_day"), max(col("day")).as("hi_day"))

  /** Rows → (ck, day, bucket) under the given domain. */
  private[graft] def bucketed(o: DataFrame, dom: DataFrame): DataFrame = {
    val z = morton32(
      quant16(col("ck"), col("lo_ck"), col("hi_ck")),
      quant16(col("day"), col("lo_day"), col("hi_day")))
    o.crossJoin(broadcast(dom))
      .select(col("ck"), col("day"),
        shiftright(z, 2 * ZDimBits - ZBucketBits).as("bucket"))
  }

  /** Per-bucket envelopes + the fixed-rectangle scan verdict. Every
    * aggregate is associative and commutative (count/min/max), so the
    * envelope of a union is the merge of the parts' envelopes — the
    * property the s33 streaming maintainer's any-split parity law
    * rests on. */
  private[graft] def envelopes(b: DataFrame): DataFrame =
    b.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("ck")).as("min_ck"), max(col("ck")).as("max_ck"),
        min(col("day")).as("min_day"), max(col("day")).as("max_day"))
      .withColumn("would_scan",
        !(col("max_ck") < RectCkLo || col("min_ck") > RectCkHi ||
          col("max_day") < RectDayLo || col("min_day") > RectDayHi))

  /** q180 bucket count: equi-depth histogram width. */
  val EqDepthBuckets = 8

  /** q180: equi-depth column statistics — the ANALYZE-TABLE read a
    * cost-based optimizer consumes: the o_totalprice column reduced to
    * [[EqDepthBuckets]] equal-population buckets, each reporting its
    * upper boundary (a DISC quantile — an attained value), actual row
    * count, distinct-value count and min/max. Equi-depth (not
    * equi-width) is what survives skew: a selectivity estimate reads
    * rows/bucket ≈ n/B regardless of how lopsided the values are, which
    * is exactly why every CBO (and DuckDB/Spark's own ANALYZE) builds
    * this shape.
    *
    * Semantics: boundary_k = min v with (a_v + c_v)·B ≥ k·n over the
    * ranked histogram; a value belongs to the FIRST bucket whose
    * boundary admits it (ties never split across buckets — the histogram
    * convention; a massive tie degenerates gracefully: all-one-value
    * input yields ONE bucket, law-pinned). All integer arithmetic.
    *
    * Scale posture: the rank offsets come from the shared
    * [[Stats.rankedHist]] two-phase prefix (zero global sorts, zero
    * unpartitioned windows — the q173/q174 substrate, third consumer);
    * the boundary scan is a constant-B explode over the bounded
    * histogram; bucket assignment is a size(filter(...)) against ONE
    * broadcast boundary array (single-row, NoCartesian-allowlisted);
    * the final aggregate is ≤ B rows. */
  def q180(spark: SparkSession, sfDir: String): DataFrame =
    equiDepthStats(Tables.orders(spark, sfDir)
      .select((col("o_totalprice").cast("decimal(12,2)") * 100).cast("long").as("v")))

  /** q180 kernel on any single-long-column frame `v` (planted seam). */
  private[graft] def equiDepthStats(vals: DataFrame): DataFrame =
    equiDepthStatsOfCounts(
      vals.groupBy(col("v")).agg(count(lit(1)).as("cnt")))

  /** q180 kernel on a pre-counted (v, cnt) frame — the seam the s50
    * streaming read enters through, so stream and batch share one
    * histogram definition. */
  private[graft] def equiDepthStatsOfCounts(counts: DataFrame): DataFrame = {
    val B = EqDepthBuckets
    // the ranked histogram feeds the total, the boundary scan and the
    // bucket assignment (q104 pinning discipline)
    val rh = graft.ops.Dsl.pin(Stats.rankedHistOfCounts(counts))
    val tot = rh.agg(sum(col("c")).as("n"))
    val bounds = rh.join(broadcast(tot))
      .withColumn("k", explode(sequence(lit(1), lit(B))))
      .filter((col("a") + col("c")) * B >= col("k") * col("n"))
      .groupBy(col("k")).agg(min(col("v")).as("ub"))
      .agg(array_sort(collect_set(col("ub"))).as("ubs"))
    rh.join(broadcast(bounds))
      .withColumn("bucket",
        (size(filter(col("ubs"), x => x < col("v"))) + 1).cast("int"))
      .groupBy(col("bucket"))
      .agg(max(col("v")).as("ub"), sum(col("c")).as("n_rows"),
        count(lit(1)).as("n_distinct"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
      .select(col("bucket"), col("ub"), col("n_rows"), col("n_distinct"),
        col("min_v"), col("max_v"))
      .orderBy(col("bucket"))
  }
}
