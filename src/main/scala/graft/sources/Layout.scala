package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Data-layout operators — the storage-side half of the 100 TB posture
  * (SURVEY.md §7.5). Correct operators on a bad layout still shuffle the
  * world; these helpers pin the two layouts that delete shuffles and scans
  * outright, and LayoutSpec asserts the resulting physical plans so a
  * regression fails in `sbt test`, not on a cluster:
  *
  *  - **Bucketing** (hash-clustered, optionally bucket-sorted files): both
  *    sides of a fact⋈fact equi-join bucketed on the join key by the same
  *    bucket count satisfy the join's distribution requirement at read
  *    time — the plan has NO Exchange. At 100 TB that is the difference
  *    between re-shuffling terabytes per query and reading co-located
  *    files; the write-side shuffle is paid once, at ingest.
  *  - **Partitioned directories** (`key=value` paths): equality/IN
  *    predicates on the partition column prune at the DIRECTORY level —
  *    `PartitionFilters` in the scan, non-matching files never opened.
  *    The right layout for low-cardinality scan predicates (event_type,
  *    date) exactly as the reference's per-type event dispatch implies.
  *
  * Choosing keys: bucket on the highest-volume equi-join key (custkey,
  * user_id), partition on low-cardinality scan predicates — never the
  * reverse (bucketing on a scan predicate buys nothing; partitioning on a
  * high-cardinality key explodes the file count, the classic small-files
  * failure).
  */
object Layout {

  /** Write `df` as a bucketed (and optionally bucket-sorted) external
    * parquet table at `path`, registered as `name`. Bucketed reads require
    * the table catalog (plain `spark.read.parquet` has no bucket spec), so
    * this is a `saveAsTable` with an explicit external location. */
  def writeBucketed(df: DataFrame, name: String, path: String, buckets: Int,
      key: String, sortCols: Seq[String] = Nil): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $name")
    val w = df.write.mode("overwrite").format("parquet").option("path", path)
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(name)
  }

  /** Write `df` as a `key=value`-partitioned parquet directory tree. */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Compact a parquet directory into ~`targetBytes` files — the
    * small-files repair every streaming/file-source pipeline needs (each
    * micro-batch appends a file; a year of 1-second triggers is 31M files,
    * and at 100 TB the NameNode/listing cost kills scans before the data
    * does). Partition count = ceil(estimated bytes / target), estimated
    * from the scan's own statistics (file footprint), so the operator needs
    * no extra pass over the data. Optionally range-clusters by a column so
    * parquet row-group min/max stats become selective for later filters on
    * it (poor-man's clustering; sorting within partitions costs nothing
    * extra at write time).
    * Returns the partition count written. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L << 20, clusterBy: Option[String] = None): Int = {
    import org.apache.spark.sql.functions.col
    val df = spark.read.parquet(inDir)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = math.max(1L, ((bytes + targetBytes - 1) / targetBytes).toLong).toInt
    val shaped = clusterBy match {
      case Some(c) => df.repartitionByRange(parts, col(c)).sortWithinPartitions(col(c))
      case None    => df.repartition(parts)
    }
    shaped.write.mode("overwrite").parquet(outDir)
    parts
  }

  /** The co-located join demo LayoutSpec pins: orders ⋈ customer on
    * custkey, both sides read from same-bucket-count tables. The JOIN stage
    * is Exchange-free (bucketed scans satisfy its distribution requirement
    * directly); any aggregation a caller stacks on a different key still
    * shuffles its own — much smaller — input, which is the correct split of
    * work at scale. */
  def bucketedOrdersJoin(spark: SparkSession, ordersTable: String,
      customerTable: String): DataFrame = {
    val o = spark.table(ordersTable)
    val c = spark.table(customerTable)
    o.join(c, o("o_custkey") === c("c_custkey"))
  }

  /** Bit-interleave of two longs already scaled into [0, 2^bits): bit i of
    * `a` lands at z-bit 2i+1, bit i of `b` at z-bit 2i — the Morton curve.
    * Pure shift/and/or composition, so it stays inside whole-stage codegen
    * (no UDF). */
  def zvalue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_.bitwiseOR(_))
  }

  /** Write `df` range-clustered along the Morton (z-order) curve of two
    * numeric columns — ONE layout that serves range/box predicates on
    * EITHER column (or both): with `files` ≈ 2^(2k) output files, an
    * aligned 1/2^k-selectivity band on either single dimension touches
    * ~2^k of them (the other dimension's bits fan out), where a linear
    * sort on column A answers A-bands sharply but B-bands read every
    * file. Parquet min/max footer stats on the data columns make the
    * pruning real at scan time; the LayoutSpec pin measures it by
    * counting distinct files contributing rows to box queries.
    *
    * Both columns are affinely rescaled to the SAME `bits`-wide range
    * first (per-column min/max from one tiny aggregate — a write-time
    * layout decision, one row to the driver): without normalization the
    * wider-domain column dominates the curve's high bits and the layout
    * degrades to a linear sort on it. 8 bits per dimension addresses
    * 65k curve cells — file-granularity clustering needs no more, and
    * (range · 255) stays far inside long arithmetic for any key below
    * 2^55. At 100 TB the same operator runs at ingest/compaction time
    * (the write shuffle is paid once, like [[writeBucketed]]); a
    * production variant would swap the affine rescale for
    * percentile-rank bucketing when domains are skewed. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      files: Int, bits: Int = 8): Unit = {
    import org.apache.spark.sql.functions._
    val Array(aMin, aMax, bMin, bMax) =
      df.agg(min(col(colA)).cast("long"), max(col(colA)).cast("long"),
        min(col(colB)).cast("long"), max(col(colB)).cast("long"))
        .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    val top = (1L << bits) - 1
    def scaled(c: String, lo: Long, hi: Long) =
      if (hi == lo) lit(0L)
      else (col(c).cast("long") - lo) * top / (hi - lo)
    df.withColumn("_z", zvalue(scaled(colA, aMin, aMax), scaled(colB, bMin, bMax), bits))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
