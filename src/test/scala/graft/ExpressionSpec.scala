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

  test("native dot_int == HOF dot_int exactly on quantized sf0.001 embeddings") {
    val emb = graft.tables.Tables.embeddings(spark, sf001)
      .select($"vec_id",
        transform($"embedding", v => floor(v.cast("double") * 100).cast("int")).as("q"))
    val q = emb.filter($"vec_id" === 0).select($"q".as("qq"))
    val both = emb.crossJoin(broadcast(q))
      .select($"vec_id",
        Dsl.dotInt($"q", $"qq").as("native"),
        Dsl.dotIntHof($"q", $"qq").as("hof"))
    assert(both.filter($"native" =!= $"hof" ||
      ($"native".isNull =!= $"hof".isNull)).isEmpty)
    assert(both.count() == 500)
  }

  test("dot_int is SQL-callable after GraftExtensions.install") {
    GraftExtensions.install(spark)
    val row = spark.sql("SELECT dot_int(array(1, -2, 3), array(4, 5, 6)) AS d").collect()
    assert(row.length == 1 && row(0).getLong(0) == 4L - 10L + 18L)
  }

  test("null input yields null (BinaryExpression null-safety)") {
    val df = Seq((Some(Array(1.0f, 2.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val r = df.select(Dsl.cosine($"a", $"b").as("c")).collect()
    assert(r(0).isNullAt(0))
  }
}
