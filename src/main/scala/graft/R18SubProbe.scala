package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TEMPORARY round-18 sub-stage probe for q36 (deleted before round end):
  * times each stage of the PPJoin pipeline in isolation with the noop sink,
  * min of 3 interleaved passes, to locate where the 2.5 s run phase goes. */
object R18SubProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.applyStaticEngineConfs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkEntry.applyEngineConfs(spark)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").count()

    val t = 0.5
    def sh = graft.queries.Text.rawShingles(spark, sfDir)
      .select(col("doc_id"), xxhash64(col("shingle")).as("hm"))
      .distinct()
    def dfShared = sh.groupBy(col("hm")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
    def perDoc = sh.join(dfShared, Seq("hm"), "left")
      .select(col("doc_id"),
        struct(coalesce(col("df"), lit(1L)).as("df"), col("hm").as("hm")).as("e"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(col("e"))).as("arr"))
      .select(col("doc_id"), col("arr"), size(col("arr")).cast("long").as("ns"))
    val prefixLen = (col("ns") - ceil(col("ns") * t).cast("long") + 1).cast("int")
    def prefix = perDoc
      .select(col("doc_id"), col("ns"),
        posexplode(slice(col("arr"), lit(1), prefixLen)).as(Seq("p", "e")))
      .filter(col("e").getField("df") >= 2)
      .select(col("doc_id"), col("e").getField("hm").as("hm"), col("ns"),
        (col("p") + 1).as("i"))
    def cand = prefix.select(col("doc_id").as("doc_a"), col("hm"), col("ns").as("na"), col("i").as("ia"))
      .join(prefix.select(col("doc_id").as("doc_b"), col("hm"), col("ns").as("nb"), col("i").as("ib")),
        Seq("hm"))
      .filter(col("doc_a") < col("doc_b") &&
        col("nb").cast("double") >= col("na").cast("double") * t &&
        col("nb").cast("double") <= col("na").cast("double") / t &&
        expr("1 + least(na - ia, nb - ib) >= (na + nb + 2) div 3"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    def docSets = perDoc.select(col("doc_id"),
      array_sort(transform(col("arr"), e => e.getField("hm"))).as("set"), col("ns"))
    val jac = col("n_inter").cast("double") /
      (col("na") + col("nb") - col("n_inter")).cast("double")
    def full = cand
      .join(docSets.select(col("doc_id").as("doc_a"), col("set").as("set_a"), col("ns").as("na")), Seq("doc_a"))
      .join(docSets.select(col("doc_id").as("doc_b"), col("set").as("set_b"), col("ns").as("nb")), Seq("doc_b"))
      .withColumn("n_inter", graft.ops.Dsl.sortedIntersectCount(col("set_a"), col("set_b")))
      .select(col("doc_a"), col("doc_b"), col("n_inter"), jac.as("jaccard"))
      .filter(jac >= lit(t))
      .orderBy(col("doc_a"), col("doc_b"))

    // raw shingle stream without distinct, for the distinct's marginal cost
    def raw = graft.queries.Text.rawShingles(spark, sfDir)
      .select(col("doc_id"), xxhash64(col("shingle")).as("hm"))

    val stages: Seq[(String, () => DataFrame)] = Seq(
      "raw_hash" -> (() => raw),
      "sh_distinct" -> (() => sh),
      "dfShared" -> (() => dfShared),
      "perDoc" -> (() => perDoc),
      "prefix" -> (() => prefix),
      "cand" -> (() => cand),
      "full_q36" -> (() => full))

    val samples = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    for (_ <- 1 to 3; (name, fn) <- stages) {
      val t0 = System.nanoTime()
      fn().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      SparkEntry.clearGraftCaches(spark)
      samples(name) = dt :: samples(name)
    }
    stages.foreach { case (name, _) =>
      val s = samples(name)
      println(f"SUBSTAGE $name min=${s.min}%.3f all=${s.reverse.map(x => f"$x%.2f").mkString(",")}")
    }
    // row counts for context (outside timings)
    stages.foreach { case (name, fn) =>
      println(s"COUNT $name ${fn().count()}")
      SparkEntry.clearGraftCaches(spark)
    }
    spark.stop()
  }
}
