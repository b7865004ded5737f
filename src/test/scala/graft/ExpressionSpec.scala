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

  test("native cosine == HOF cosine on MIXED float/double arrays (the IVF assignment shape)") {
    // float corpus embedding vs double centroid — the q55/q56 cellSims
    // signature; the native expression must not insert a lossy cast
    val emb = graft.tables.Tables.embeddings(spark, sf001)
    val q = emb.filter($"vec_id" === 0)
      .select(transform($"embedding", v => v.cast("double") * 1.000001).as("cvec"))
    val both = emb.crossJoin(broadcast(q))
      .select($"vec_id",
        Dsl.cosine($"embedding", $"cvec").as("native"),
        Dsl.cosineHof($"embedding", $"cvec").as("hof"))
    assert(both.filter($"native" =!= $"hof" ||
      ($"native".isNull =!= $"hof".isNull)).isEmpty)
    assert(both.count() == 500)
    // and the double side is genuinely double precision: the result must
    // equal the same arithmetic done in Scala doubles exactly — a lossy
    // narrow to float (double 0.1 → float 0.1 differs by ~1.5e-9) would
    // shift the norm term far above double epsilon
    GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0F, 0.0F), array(CAST(1.0 AS DOUBLE), CAST(0.1 AS DOUBLE))) AS c")
      .collect()(0).getDouble(0)
    assert(r == 1.0 / math.sqrt(1.0 + 0.1 * 0.1))
  }

  test("native dot_fold == HOF fold bit-for-bit on the LSH plane shape (float x long)") {
    // the Ann sign-test signature: float embedding x long plane weights
    val planes = graft.ops.Ann.weights(0).toSeq
    val both = graft.tables.Tables.embeddings(spark, sf001)
      .select($"vec_id",
        Dsl.dotFold($"embedding", typedLit(planes)).as("native"),
        aggregate(
          zip_with($"embedding", typedLit(planes), (x, w) => x.cast("double") * w.cast("double")),
          lit(0.0), (acc, v) => acc + v).as("hof"))
    assert(both.filter($"native" =!= $"hof" ||
      ($"native".isNull =!= $"hof".isNull)).isEmpty)
    assert(both.count() == 500)
    // null contract + SQL registration
    GraftExtensions.install(spark)
    val r = spark.sql(
      """SELECT dot_fold(array(1.0F, 2.0F), array(3L, -4L)) AS d,
        |       dot_fold(array(1.0F), array(1L, 2L)) AS mismatched""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 1.0 * 3.0 + 2.0 * -4.0)
    assert(r.isNullAt(1))
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

  test("mismatched lengths and null elements yield NULL — native == HOF on the edge cases") {
    GraftExtensions.install(spark)
    // unequal lengths: HOF zip_with null-pads → fold poisoned → NULL
    val r1 = spark.sql(
      """SELECT dot_int(array(1,2,3), array(1,2)) AS d,
        |       cosine_sim(array(1.0F, 2.0F), array(1.0F)) AS c""".stripMargin).collect()(0)
    assert(r1.isNullAt(0) && r1.isNullAt(1))
    // null element: same
    val r2 = spark.sql(
      """SELECT dot_int(array(1, CAST(NULL AS INT)), array(1, 2)) AS d,
        |       cosine_sim(array(1.0F, CAST(NULL AS FLOAT)), array(1.0F, 2.0F)) AS c""".stripMargin)
      .collect()(0)
    assert(r2.isNullAt(0) && r2.isNullAt(1))
    // and the HOF specs agree on the unequal-length case
    val hof = spark.sql("SELECT aggregate(zip_with(array(1,2,3), array(1,2), (x, y) -> CAST(x AS BIGINT) * CAST(y AS BIGINT)), 0L, (a, v) -> a + v) AS d").collect()(0)
    assert(hof.isNullAt(0))
  }

  test("null input yields null (BinaryExpression null-safety)") {
    val df = Seq((Some(Array(1.0f, 2.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val r = df.select(Dsl.cosine($"a", $"b").as("c")).collect()
    assert(r(0).isNullAt(0))
  }

  test("ChunkGenerator == the q54 built-in explode+slice pipeline, row for row") {
    import graft.queries.Text
    // the generator at q54's OVERLAPPING geometry, digested identically —
    // if the two disagree anywhere in the corpus, except() surfaces it
    val gen = graft.tables.Tables.documents(spark, sf001)
      .select($"doc_id",
        Dsl.chunkGen(split($"text", " "), Text.ChunkLen, Text.ChunkStride)
          .as(Seq("chunk_idx", "start_tok", "n_chunk_tokens", "chunk_text")))
      .select($"doc_id", $"chunk_idx", $"start_tok", $"n_chunk_tokens",
        md5($"chunk_text".cast("binary")).as("digest"))
    val builtin = Text.q54(spark, sf001)
    assert(gen.count() == builtin.count())
    assert(gen.except(builtin).isEmpty && builtin.except(gen).isEmpty)
  }

  test("chunk_gen is SQL-callable after GraftExtensions.install (LATERAL VIEW form)") {
    GraftExtensions.install(spark)
    val rows = spark.sql(
      """SELECT c.chunk_idx, c.start_tok, c.n_chunk_tokens, c.chunk_text
        |FROM VALUES ('a b c d e') AS t(txt)
        |LATERAL VIEW chunk_gen(split(txt, ' '), 2, 2) c
        |ORDER BY c.chunk_idx""".stripMargin).collect()
    assert(rows.map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3))).toSeq ==
      Seq((0, 0, 2, "a b"), (1, 2, 2, "c d"), (2, 4, 1, "e")))
    // a NULL array generates zero rows (non-outer explode semantics)
    assert(spark.sql(
      "SELECT c.* FROM VALUES (CAST(NULL AS STRING)) AS t(txt) " +
      "LATERAL VIEW chunk_gen(split(txt, ' '), 2, 2) c").collect().isEmpty)
  }

  test("native minhash_sig aggregate == composed explode+MIN signature bit-for-bit (q34 kernel)") {
    import graft.queries.{Dedup, Text}
    val sh = Text.rawShingles(spark, sf001)
      .select($"doc_id", (Dsl.h60($"shingle") % Dedup.P).as("hm"))
    val native = Dedup.signatures(sh)
    val composed = Dedup.signaturesComposed(sh)
    assert(native.count() == composed.count())
    assert(native.except(composed).isEmpty && composed.except(native).isEmpty)
    // signature law on a planted group: one row per doc, K components,
    // each strictly below P (P is the empty-min sentinel, unreachable for
    // any real input), duplicate shingles don't change the signature
    val planted = Seq((1L, 7L), (1L, 7L), (1L, 11L), (2L, 7L)).toDF("doc_id", "hm")
    val sigs = Dedup.signatures(planted).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L).length == Dedup.K && sigs(1L).forall(_ < Dedup.P))
    val dedupped = Dedup.signatures(Seq((1L, 7L), (1L, 11L)).toDF("doc_id", "hm"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == dedupped(1L), "min is duplicate-insensitive")
    // doc 2 holds a subset of doc 1's shingles → componentwise >= holds
    assert(sigs(1L).zip(sigs(2L)).forall { case (m1, m2) => m1 <= m2 })
  }

  test("native simhash_sig aggregate == composed explode+SUM fingerprint bit-for-bit (q35 kernel)") {
    import graft.queries.Dedup
    val tok = graft.tables.Tables.documents(spark, sf001)
      .select($"doc_id", explode(split($"text", " ")).as("token"))
      .select($"doc_id", Dsl.h60($"token").as("hm"))
    val native = Dedup.simhashFingerprints(tok)
    val composed = Dedup.simhashComposed(tok)
    assert(native.count() == composed.count())
    assert(native.except(composed).isEmpty && composed.except(native).isEmpty)
    // fingerprint laws on planted input: order-invariance (the multiset
    // property q35's shuffled-copy detection rests on) and the majority
    // fold (a bit is set iff set-count strictly exceeds unset-count)
    val a = Dedup.simhashFingerprints(Seq((1L, 5L), (1L, 6L), (1L, 5L)).toDF("doc_id", "hm"))
      .collect()(0).getLong(1)
    val b = Dedup.simhashFingerprints(Seq((1L, 6L), (1L, 5L), (1L, 5L)).toDF("doc_id", "hm"))
      .collect()(0).getLong(1)
    assert(a == b, "fingerprint must be input-order invariant")
    // 5=101b, 5=101b, 6=110b: bit0 tally +1, bit1 tally -1, bit2 tally +3 → 101b
    assert(a == 5L)
  }

  test("minhash_sig is SQL-callable after GraftExtensions.install (GROUP BY aggregate form)") {
    GraftExtensions.install(spark)
    val viaSql = spark.sql(
      "SELECT doc_id, minhash_sig(hm) AS sig FROM VALUES (1L, 7L), (1L, 11L), (2L, 7L) " +
      "AS t(doc_id, hm) GROUP BY doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaApi = graft.queries.Dedup.signatures(
      Seq((1L, 7L), (1L, 11L), (2L, 7L)).toDF("doc_id", "hm"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql == viaApi)
    // and the simhash sibling
    val sim = spark.sql(
      "SELECT simhash_sig(hm) AS h FROM VALUES (5L), (5L), (6L) AS t(hm)")
      .collect()(0).getLong(0)
    assert(sim == 5L)
    // and the frequent-items sibling (exact regime: 2 symbols << budget)
    val fs = spark.sql(
      "SELECT freq_sketch(t) AS sk FROM VALUES ('a'), ('a'), ('b') AS v(t)")
      .selectExpr("inline(sk)")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fs == Map("a" -> 2L, "b" -> 1L))
  }

  test("freq_sketch: exact when the alphabet fits; Misra-Gries bounds when it does not (q88 kernel)") {
    import graft.ops.Dsl.freqSketch
    import org.apache.spark.sql.functions.{col, explode}

    def sketch(items: Seq[String], m: Int, parts: Int): Map[String, Long] =
      items.toDF("token").repartition(parts)
        .agg(freqSketch(col("token"), m).as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.token"), col("e.est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // exact regime: alphabet (3) <= m (8) → counts are exact regardless
    // of partitioning, because no eviction can ever fire
    val stream = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(3)("c")
    val exact = Map("a" -> 40L, "b" -> 25L, "c" -> 3L)
    for (parts <- Seq(1, 7)) assert(sketch(stream, m = 8, parts) == exact)

    // sub-budget regime: m = 2 on a 5-symbol stream of N = 100.
    // Guarantees: est <= true <= est + N/(m+1), and every item with
    // true > N/(m+1) is present — for N/(m+1) = 33, that's "a" (40).
    val skew = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(15)("c") ++
      Seq.fill(12)("d") ++ Seq.fill(8)("e")
    val truth = Map("a" -> 40L, "b" -> 25L, "c" -> 15L, "d" -> 12L, "e" -> 8L)
    val bound = skew.length / (2 + 1)
    for (parts <- Seq(1, 5)) {
      val got = sketch(skew, m = 2, parts)
      assert(got.size <= 2, s"more than m survivors: $got")
      assert(got.contains("a"), s"guaranteed heavy hitter missing: $got")
      got.foreach { case (t, est) =>
        assert(est <= truth(t), s"$t overestimated: $est > ${truth(t)}")
        assert(truth(t) <= est + bound, s"$t error above N/(m+1): $got")
      }
    }
  }

  test("sorted_intersect_count == size(array_intersect) on the q36 docSets shape") {
    // the real producer shape: per-doc DISTINCT hashed shingle sets from
    // sf0.001, array_sort'd — every (a, b) doc pair compared both ways
    val perDoc = graft.tables.Tables.documents(spark, sf001)
      .select($"doc_id", split($"text", " ").as("toks"))
      .filter(size($"toks") >= 3)
      .select($"doc_id",
        explode(transform(sequence(lit(1), size($"toks") - 2),
          i => concat_ws(" ", element_at($"toks", i), element_at($"toks", i + 1),
            element_at($"toks", i + 2)))).as("shingle"))
      .select($"doc_id", xxhash64($"shingle").as("hm")).distinct()
      .groupBy($"doc_id").agg(array_sort(collect_set($"hm")).as("set"))
    val pairs = perDoc.select($"doc_id".as("a"), $"set".as("sa"))
      .join(perDoc.select($"doc_id".as("b"), $"set".as("sb")), $"a" < $"b")
      .select(
        Dsl.sortedIntersectCount($"sa", $"sb").as("native"),
        size(array_intersect($"sa", $"sb")).cast("long").as("spec"))
    assert(pairs.filter($"native" =!= $"spec" ||
      ($"native".isNull =!= $"spec".isNull)).isEmpty)
    assert(pairs.count() > 100)
  }

  test("sorted_intersect_count matches size(array_intersect) on random sorted sets (incl. skewed lengths)") {
    val rnd = new scala.util.Random(18)
    // skewed sizes exercise the galloping path; values drawn from a small
    // domain so intersections are non-trivial
    val rows = (1 to 200).map { i =>
      val na = 1 + rnd.nextInt(if (i % 3 == 0) 8 else 400)
      val nb = 1 + rnd.nextInt(if (i % 3 == 0) 400 else 8)
      val a = Seq.fill(na)(rnd.nextInt(600).toLong).distinct.sorted
      val b = Seq.fill(nb)(rnd.nextInt(600).toLong).distinct.sorted
      (a, b)
    }
    val df = rows.toDF("a", "b").select(
      Dsl.sortedIntersectCount($"a", $"b").as("native"),
      size(array_intersect($"a", $"b")).cast("long").as("spec"))
    assert(df.filter($"native" =!= $"spec").isEmpty)
  }

  test("sorted_intersect_count edge cases and SQL registration") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      """SELECT sorted_intersect_count(array(1L,2L,3L), array(2L,3L,4L)) AS c1,
        |       sorted_intersect_count(CAST(array() AS ARRAY<BIGINT>), array(1L)) AS c2,
        |       sorted_intersect_count(array(1L,2L), array(3L,4L)) AS c3,
        |       sorted_intersect_count(array(1L,2L,3L), array(1L,2L,3L)) AS c4,
        |       sorted_intersect_count(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS c5,
        |       sorted_intersect_count(array(1L, NULL), array(2L, NULL)) AS c6,
        |       sorted_intersect_count(array(1L, NULL), array(1L, 2L)) AS c7""".stripMargin)
      .collect()(0)
    assert(r.getLong(0) == 2L)
    assert(r.getLong(1) == 0L)
    assert(r.getLong(2) == 0L)
    assert(r.getLong(3) == 3L)
    assert(r.isNullAt(4))
    // shared null counts once (array_intersect semantics on sorted sets)
    assert(r.getLong(5) == 1L)
    assert(r.getLong(6) == 1L)
    // interpreted path (nullSafeEval) agrees with codegen on the same rows
    import graft.functions.SortedIntersectCount
    import org.apache.spark.sql.catalyst.util.ArrayData
    def ad(xs: Seq[java.lang.Long]): ArrayData =
      ArrayData.toArrayData(xs.toArray)
    assert(SortedIntersectCount.count(ad(Seq(1L, 2L, 3L)), ad(Seq(2L, 3L, 4L))) == 2L)
    assert(SortedIntersectCount.count(ad(Seq.empty), ad(Seq(1L))) == 0L)
    val big = ad((0L until 1000L by 2).map(java.lang.Long.valueOf))
    val small = ad(Seq(500L, 501L, 998L).map(java.lang.Long.valueOf))
    assert(SortedIntersectCount.count(small, big) == 2L)
    assert(SortedIntersectCount.count(big, small) == 2L)
  }
}
