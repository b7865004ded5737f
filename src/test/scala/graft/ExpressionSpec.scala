package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dsl

/** The native CosineSimilarity expression vs its HOF specification: exact
  * (not rounded) equality on real embeddings, SQL registration through
  * GraftExtensions, and null handling.
  */
class ExpressionSpec extends SparkSpec {

  import spark.implicits._

  test("native cosine == HOF cosine bit-for-bit on all sf0.001 embedding pairs vs query vector") {
    val emb = graft.tables.Tables.embeddings(spark, sf001)
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("qvec"))
    val both = emb.crossJoin(broadcast(q))
      .select($"vec_id",
        Dsl.cosine($"embedding", $"qvec").as("native"),
        Dsl.cosineHof($"embedding", $"qvec").as("hof"))
    // exact double equality — same operations in the same order
    assert(both.filter($"native" =!= $"hof" ||
      ($"native".isNull =!= $"hof".isNull)).isEmpty)
    assert(both.count() == 500)
  }

  test("cosine_sim is SQL-callable after GraftExtensions.install") {
    GraftExtensions.install(spark)
    try {
      graft.tables.Tables.embeddings(spark, sf001).createOrReplaceTempView("emb_ext")
      val row = spark.sql(
        """SELECT ROUND(cosine_sim(embedding, embedding), 4) AS self
          |FROM emb_ext WHERE vec_id = 0""".stripMargin).collect()
      assert(row.length == 1 && row(0).getDouble(0) == 1.0)
    } finally spark.catalog.dropTempView("emb_ext")
  }

  test("null input yields null (BinaryExpression null-safety)") {
    val df = Seq((Some(Array(1.0f, 2.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val r = df.select(Dsl.cosine($"a", $"b").as("c")).collect()
    assert(r(0).isNullAt(0))
  }
}
