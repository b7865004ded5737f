package graft

import org.apache.spark.sql.functions._
import graft.sources.Layout
import graft.tables.Tables

/** Physical-plan assertions for the storage layouts (graft.sources.Layout):
  * bucketing must delete the join shuffle, partitioned directories must
  * prune at the scan. Same discipline as PlanSpec — layout regressions fail
  * here, not on a cluster.
  */
class LayoutSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString()

  test("bucketed fact-fact join runs with zero Exchange (co-located by layout)") {
    val base = tmpDir("graft-bucketed")
    Layout.writeBucketed(Tables.orders(spark, sf001), "orders_b",
      s"$base/orders_b", buckets = 4, key = "o_custkey", sortCols = Seq("o_custkey"))
    Layout.writeBucketed(Tables.customer(spark, sf001), "customer_b",
      s"$base/customer_b", buckets = 4, key = "c_custkey", sortCols = Seq("c_custkey"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join path so the assertion is about bucketing,
      // not about the small side fitting in a broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Layout.bucketedOrdersJoin(spark, "orders_b", "customer_b")
      val plan = planOf(joined)
      assert(plan.contains("SortMergeJoin"), plan.linesIterator.take(8).mkString("\n"))
      assert(plan.contains("Bucketed: true"), "scan did not use the bucket spec")
      assert(!plan.contains("Exchange"),
        "bucketed join still shuffles:\n" + plan.linesIterator.take(20).mkString("\n"))
      // and the layout changed only the plan, not the answer
      val direct = Tables.orders(spark, sf001)
        .join(Tables.customer(spark, sf001), col("o_custkey") === col("c_custkey"))
      assert(joined.count() == direct.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("bucketed layout on the REAL q116 shape: orderkey fact-fact join and orderkey-prefixed aggregate run shuffle-free; same rows") {
    // r11 verdict item 6: the generic bucketed-join law above, proven on
    // the engine's own TPC-H Q3 shape — lineitem ⋈ orders co-located on
    // orderkey at ingest, the revenue aggregate riding the join's
    // partitioning (its grouping keys are orderkey-prefixed), customer
    // still the designed broadcast. The only Exchange left in the whole
    // executed plan is that broadcast — zero shuffle Exchanges.
    val base = tmpDir("graft-bucketed-q116")
    Layout.writeBucketed(Tables.lineitem(spark, sf001), "lineitem_bq",
      s"$base/lineitem_bq", buckets = 4, key = "l_orderkey", sortCols = Seq("l_orderkey"))
    Layout.writeBucketed(Tables.orders(spark, sf001), "orders_bq",
      s"$base/orders_bq", buckets = 4, key = "o_orderkey", sortCols = Seq("o_orderkey"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      SparkEntry.clearGraftCaches(spark) // plan-shape counting needs a cold cache
      // force the fact-fact join onto the shuffle path (the assertion is
      // about the bucket layout, not the small sf fitting in a broadcast);
      // the customer side keeps its explicit broadcast() hint
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bucketed = graft.queries.Relational.q116On(
        Tables.customer(spark, sf001),
        spark.table("orders_bq"), spark.table("lineitem_bq"))
      val plan = planOf(bucketed)
      assert(plan.contains("SortMergeJoin"), plan.linesIterator.take(10).mkString("\n"))
      assert(plan.contains("Bucketed: true"), "scan did not use the bucket spec")
      val shuffles = plan.linesIterator
        .filter(l => l.contains("Exchange") && !l.contains("BroadcastExchange")).toSeq
      assert(shuffles.isEmpty,
        "q116 on the bucketed layout still shuffles:\n" + shuffles.mkString("\n"))
      // layout changed the plan, not the answer
      val got = bucketed.collect().toSeq
      val want = graft.queries.Relational.q116(spark, sf001).collect().toSeq
      assert(got == want, "bucketed q116 diverged from the path-read form")
      assert(want.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS lineitem_bq")
      spark.sql("DROP TABLE IF EXISTS orders_bq")
    }
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    import spark.implicits._
    val dir = tmpDir("graft-dpp") + "/events_by_type"
    Layout.writePartitioned(Tables.events(spark, sf001), dir, "event_type")
    // the selective predicate lives on the DIM table — the fact scan can
    // only be pruned by a runtime (dynamic) filter fed from the dim side.
    // The dim must be a file source: over a LocalRelation the filter
    // constant-folds away and DPP sees no selective predicate at all.
    val dimDir = tmpDir("graft-dpp-dim")
    Seq(("purchase", "conversion"), ("click", "engagement"),
      ("view", "engagement"), ("signup", "acquisition"), ("error", "ops"))
      .toDF("event_type", "category").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val fact = spark.read.parquet(dir)
    val joined = fact.join(dim, Seq("event_type")).filter(col("category") === "conversion")
    val plan = joined.queryExecution.executedPlan.toString()
    assert(plan.contains("dynamicpruning"),
      "no dynamic pruning subquery in the fact scan:\n" +
        plan.linesIterator.take(20).mkString("\n"))
    assert(joined.count() ==
      Tables.events(spark, sf001).filter(col("event_type") === "purchase").count())
  }

  test("compaction collapses a small-files directory without changing the data") {
    val base = tmpDir("graft-compact")
    val fragmented = s"$base/fragmented"
    val compacted = s"$base/compacted"
    val events = Tables.events(spark, sf001)
    events.repartition(64).write.mode("overwrite").parquet(fragmented)
    def parquetFiles(dir: String) =
      new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(fragmented) == 64)
    val parts = Layout.compact(spark, fragmented, compacted, targetBytes = 1L << 30)
    assert(parts == 1 && parquetFiles(compacted) == 1,
      s"expected one output file, got $parts parts / ${parquetFiles(compacted)} files")
    val back = spark.read.parquet(compacted)
    assert(back.count() == 1000 &&
      back.except(spark.read.parquet(fragmented)).isEmpty)
    // range-clustered variant: still identical data, one file per range
    val clustered = s"$base/clustered"
    Layout.compact(spark, fragmented, clustered, targetBytes = 1L << 30,
      clusterBy = Some("user_id"))
    assert(spark.read.parquet(clustered).except(back).isEmpty)
  }

  test("partitioned directory layout prunes non-matching partitions at the scan") {
    val dir = tmpDir("graft-partitioned") + "/events_by_type"
    val events = Tables.events(spark, sf001)
    Layout.writePartitioned(events, dir, "event_type")
    val pruned = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    val plan = planOf(pruned)
    assert(plan.contains("PartitionFilters"), plan.linesIterator.take(8).mkString("\n"))
    assert(plan.contains("event_type"), "partition predicate missing from PartitionFilters")
    // pruning must not change the answer
    assert(pruned.count() == events.filter(col("event_type") === "purchase").count())
    // the partition column round-trips (moved from data to directory and back)
    assert(pruned.columns.contains("event_type"))
  }

  test("z-order clustering serves bands on EITHER dimension; linear sort reads the world for the other") {
    val base = tmpDir("graft-zorder")
    val li = Tables.lineitem(spark, sf001)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    // the baseline every warehouse starts from: range-clustered on ONE column
    li.repartitionByRange(16, col("l_partkey")).sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(s"$base/linear")
    Layout.writeZOrdered(li, s"$base/zorder", "l_partkey", "l_suppkey", files = 16)
    def filesTouched(path: String, pred: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path).filter(pred)
        .select(input_file_name()).distinct().count()
    // quarter-ish bands on each dimension (l_partkey 0..199, l_suppkey 0..9)
    val aBand = col("l_partkey") >= 150
    val bBand = col("l_suppkey") >= 8
    val all = lit(true)
    val total = filesTouched(s"$base/zorder", all)
    val (linA, linB) = (filesTouched(s"$base/linear", aBand), filesTouched(s"$base/linear", bBand))
    val (zA, zB) = (filesTouched(s"$base/zorder", aBand), filesTouched(s"$base/zorder", bBand))
    // linear answers its own sort column sharply — and pays with a full
    // scan for the other dimension
    assert(linA * 2 <= total, s"linear a-band touched $linA of $total")
    assert(linB >= total - 1, s"linear layout should read ~all files for a b-band, got $linB")
    // one z-ordered layout prunes BOTH: each band fixes that dimension's
    // high curve bits, leaving only the other dimension's fan-out
    assert(zA * 2 <= total, s"z a-band touched $zA of $total")
    assert(zB * 2 <= total, s"z b-band touched $zB of $total")
    assert(zB * 2 <= linB, s"z b-band ($zB) not better than linear ($linB)")
    // a 2-D box intersects both slabs — never more files than either band
    val zBox = filesTouched(s"$base/zorder", aBand && bBand)
    assert(zBox <= zA && zBox <= zB, s"box $zBox vs bands $zA/$zB")
    // the layout changed file placement, not the data
    assert(spark.read.parquet(s"$base/zorder").count() == li.count())
    assert(spark.read.parquet(s"$base/zorder").filter(aBand && bBand).count() ==
      li.filter(aBand && bBand).count())
  }
}
