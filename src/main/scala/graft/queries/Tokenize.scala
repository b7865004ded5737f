package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Tokenizer merge-learning (SURVEY.md §2.2 q94) — the capstone of the
  * tokenizer-adjacent family (q64 bigram model, q74 PMI collocations):
  * learn a byte-pair-encoding merge table from the corpus, the exact
  * algorithm every production BPE trainer runs (Sennrich et al., ACL'16).
  */
object Tokenize {

  /** Number of merge rules to learn; the oracle unrolls exactly this many
    * rounds. Small enough that the synthetic corpus (31-word vocabulary,
    * ~140 mergeable positions) can never exhaust its pair supply before
    * the last round — an empty argmax would make the oracle's cross join
    * annihilate the chain while the engine breaks early, so the constant
    * is deliberately far below the corpus's merge capacity. */
  val BpeMerges = 16

  /** q94: BPE merge learning — iterated greedy most-frequent-adjacent-pair
    * merging over the word vocabulary for [[BpeMerges]] rounds. Round r:
    * count adjacent symbol pairs across all words (weighted by word
    * frequency, overlapping positions counted as the reference BPE
    * `get_stats` does), pick the most frequent pair (ties by (a, b)
    * lexicographic — counts are exact integers, so no float discipline is
    * needed), and rewrite every word's symbol sequence by merging that
    * pair's occurrences greedily left-to-right (a left fold, so `a a a`
    * under merge (a,a) becomes `aa a`, never `a aa` — the oracle's
    * non-overlapping string replace has identical semantics). Output: the
    * learned merge table (rule_id, a, b, merged, cnt).
    *
    * Scale posture: the ONLY corpus-scale step is the initial word count —
    * one shuffle of the token stream with map-side partials. Every round
    * then operates on the (freq, seq) VOCABULARY frame (millions of rows
    * at 100 TB, never the corpus): pair extraction is a map-side
    * higher-order transform, the per-round argmax is a TakeOrdered(1)
    * scalar probe (one row to the driver per round — the q57 fixpoint
    * posture; driver state is just the M learned rules), and the merge
    * rewrite is a map-side fold with no shuffle at all. Lineage is
    * truncated per round by eager localCheckpoint exactly like q93's
    * iteration, so round cost stays flat. */
  def q94(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val vocab = docs
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) >= 1)
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .select(col("freq"),
        transform(sequence(lit(1), length(col("token"))),
          i => col("token").substr(i, lit(1))).as("seq"))
    learnMerges(spark, vocab, BpeMerges)
  }

  /** q94 core on an arbitrary (freq: long, seq: array<string>) vocabulary
    * frame — exposed so the PropertySpec law can compare the distributed
    * loop against a driver-side reference BPE on planted vocabularies. */
  private[graft] def learnMerges(spark: SparkSession, vocab: DataFrame,
      merges: Int): DataFrame = {
    import spark.implicits._
    var v = vocab.localCheckpoint(true)
    val rules = Seq.newBuilder[(Int, String, String, String, Long)]
    var exhausted = false
    for (r <- 1 to merges if !exhausted) {
      // size >= 2 guard mirrors the oracle's generate_series(1, len-1)
      // yielding no rows (Spark's sequence(1, 0) would run DESCENDING)
      val best = v.filter(size(col("seq")) >= 2)
        .select(col("freq"),
          explode(transform(sequence(lit(1), size(col("seq")) - 1),
            i => struct(element_at(col("seq"), i).as("a"),
              element_at(col("seq"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        rules += ((r, a, b, a + b, cnt))
        v = v.select(col("freq"), mergePair(col("seq"), a, b).as("seq"))
          .localCheckpoint(true)
      }
    }
    rules.result().toDF("rule_id", "a", "b", "merged", "cnt")
      .orderBy(col("rule_id"))
  }

  /** Greedy left-to-right merge of adjacent (a, b) into a+b — the
    * reference BPE rewrite as a fold: a freshly merged symbol can itself
    * be the `a` of a LATER position's merge (`a b b` under (a,b) gives
    * `ab b`; `a a a` under (a,a) gives `aa a` because the merged `aa` no
    * longer equals `a`). */
  private[graft] def mergePair(seq: Column, a: String, b: String): Column =
    aggregate(seq, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))
}
