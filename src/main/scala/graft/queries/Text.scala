package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Text-analysis / LLM-training-data operators over `documents`
  * (SURVEY.md §2.2 q29, q30 + north-star text ops q36, q39–q42).
  *
  * All tokenization is `split(text, ' ')` — the documents are synthetic
  * space-separated token streams (FIXTURES.md) — and every op is built from
  * codegen'd expressions (split/explode/higher-order funcs), so each one
  * scales as a plain shuffle-grouped pipeline.
  */
object Text {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)

  /** Exploded (doc_id, token) stream, multiset semantics. */
  private def tokens(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("token"))

  /** Distinct (doc_id, shingle) word-trigram sets — the shingling stage
    * shared by exact n-gram Jaccard (q36) and MinHash-LSH (q34). */
  private[queries] def shingles(spark: SparkSession, sfDir: String): DataFrame = {
    val sp = split(col("text"), " ")
    docs(spark, sfDir)
      .filter(size(sp) >= 3)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(sp) - 2),
          i => concat_ws(" ", element_at(sp, i), element_at(sp, i + 1), element_at(sp, i + 2))))
          .as("shingle"))
      .distinct()
  }

  /** q29: exact-duplicate detection by content hash — groups of identical
    * documents (md5 over the UTF-8 bytes, comparable with DuckDB's md5). */
  def q29(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("rep_doc"))
      .filter(col("n_copies") >= 2)
      .orderBy(col("h"))

  /** q30: corpus token frequencies, top 20. */
  def q30(spark: SparkSession, sfDir: String): DataFrame =
    tokens(spark, sfDir)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)

  /** q36: exact n-gram (word-trigram) Jaccard near-duplicate pairs.
    * |A∩B| via a self-join on shingle (only docs sharing a shingle ever
    * meet — no cartesian), |A|,|B| precomputed; pairs with J ≥ 0.5.
    * This is the exact verifier; q34's MinHash-LSH is the sub-quadratic
    * candidate generator for the 100 TB path. */
  def q36(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = shingles(spark, sfDir).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("ns"))
    // Shingles held by a single document can't contribute to any
    // intersection and are the overwhelming majority of the stream — keep
    // only shingles seen in ≥ 2 docs before the self-join (result
    // unchanged). The surviving key set is tiny (only genuinely shared
    // shingles), so it broadcasts; a window-count formulation was measured
    // slower (adds a per-shingle sort to the shuffle).
    val sharedKeys = sh.groupBy(col("shingle"))
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("shingle"))
    val shared = sh.join(broadcast(sharedKeys), Seq("shingle"))
    val a = shared.select(col("doc_id").as("doc_a"), col("shingle"))
    val b = shared.select(col("doc_id").as("doc_b"), col("shingle"))
    val inter = a.join(b, Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    val jac = col("n_inter").cast("double") /
      (col("na") + col("nb") - col("n_inter")).cast("double")
    inter
      .join(sizes.select(col("doc_id"), col("ns").as("na")), col("doc_a") === col("doc_id")).drop("doc_id")
      .join(sizes.select(col("doc_id"), col("ns").as("nb")), col("doc_b") === col("doc_id")).drop("doc_id")
      .select(col("doc_a"), col("doc_b"), col("n_inter"), jac.as("jaccard"))
      .filter(jac >= 0.5)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** q39: language identification by corpus-learned token profiles — each
    * doc votes with its tokens' per-language frequencies; argmax language
    * (ties broken alphabetically). A self-supervised n-gram langid over the
    * corpus itself: profile build + score are two grouped joins. */
  def q39(spark: SparkSession, sfDir: String): DataFrame = {
    val tok = tokens(spark, sfDir)
    val profile = tok.groupBy(col("token"), col("lang").as("cand_lang"))
      .agg(count(lit(1)).as("cnt"))
    val scored = tok.select(col("doc_id"), col("lang"), col("token"))
      .join(profile, Seq("token"))
      .groupBy(col("doc_id"), col("lang"), col("cand_lang"))
      .agg(sum(col("cnt")).as("score"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("cand_lang"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("cand_lang").as("pred_lang"), col("score"))
      .orderBy(col("doc_id"))
  }

  /** q40: document quality scoring — token count, type-token ratio, average
    * token length, and a categorical quality flag. Pure exact arithmetic. */
  def q40(spark: SparkSession, sfDir: String): DataFrame = {
    val sp = split(col("text"), " ")
    val nTokens = size(sp)
    val nDistinct = size(array_distinct(sp))
    val ttr = nDistinct.cast("double") / nTokens.cast("double")
    docs(spark, sfDir)
      .select(col("doc_id"), col("n_chars"),
        nTokens.as("n_tokens"),
        nDistinct.as("n_distinct"),
        ttr.as("ttr"),
        ((length(col("text")) - nTokens + 1).cast("double") / nTokens.cast("double"))
          .as("avg_token_len"),
        when(nTokens >= 20 && ttr >= 0.2, "good").otherwise("low").as("quality"))
      .orderBy(col("doc_id"))
  }

  /** q41: token counting — whitespace tokens and a BPE-ish regex token
    * count (runs of letters), plus chars-per-token. */
  def q41(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        regexp_count(col("text"), lit("[a-z]+")).as("re_tokens"),
        (col("n_chars").cast("double") / size(split(col("text"), " ")).cast("double"))
          .as("chars_per_token"))
      .orderBy(col("doc_id"))

  /** q42: order-insensitive document fingerprint — md5 over the sorted
    * distinct token set, the bag-of-words analogue of q29's exact hash.
    * Groups are potential shuffled-copy duplicates. */
  def q42(spark: SparkSession, sfDir: String): DataFrame = {
    val fp = md5(array_join(array_sort(array_distinct(split(col("text"), " "))), " ")
      .cast("binary"))
    docs(spark, sfDir)
      .groupBy(fp.as("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("rep_doc"))
      .orderBy(col("fp"))
  }
}
