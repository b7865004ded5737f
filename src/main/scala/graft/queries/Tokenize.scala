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
    learnMergeRules(vocab, merges)
      .toDF("rule_id", "a", "b", "merged", "cnt")
      .orderBy(col("rule_id"))
  }

  /** The learn loop itself, returning the driver-side rule list (M rows —
    * the only driver state q94 ever holds) so the q111 ENCODE pass can
    * replay the rules without re-deriving them from the output frame. */
  private[graft] def learnMergeRules(vocab: DataFrame,
      merges: Int): Seq[(Int, String, String, String, Long)] = {
    // LAZY localCheckpoint (r18, guide §5 driver-job latency): each
    // round's vocab state has a SINGLE consumer chain — the round's
    // pair-count collect runs first and materializes the checkpoint as a
    // side effect, then the (lazy) rewrite for the next round reads the
    // already-cached blocks — so the eager form's dedicated
    // materialization job per round (2 driver jobs/round -> 1) bought
    // nothing, and the LAST round's rewrite never materializes at all.
    // The logical plan still truncates per round (LogicalRDD), which is
    // what keeps Catalyst analysis O(1) per round; the r9 lazy-cache
    // under-match hazard needs a first materialization racing on two
    // branches of one job — here consumers are strictly sequential jobs.
    var v = vocab.localCheckpoint(false)
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
          .localCheckpoint(false)
      }
    }
    rules.result()
  }

  /** q111: BPE ENCODE — the forward pass q94's learner was missing: apply
    * the learned merge table to every document and audit the compression
    * it buys, per source: word count, character count (the 0-rule token
    * count), BPE token count, and chars-per-token (the ratio a tokenizer
    * team actually tracks). Encoding is the reference BPE apply: each
    * word's character sequence rewritten by every rule in rule_id order,
    * greedily left-to-right per rule — the SAME [[mergePair]] fold the
    * learner uses, so "encode the training corpus" is definitionally the
    * learner's final vocabulary state (the law LlmOpsSpec pins).
    *
    * Scale posture: the corpus-scale work is ONE (source, token) count
    * shuffle with map-side partials; the encode itself runs on the
    * DISTINCT-vocabulary frame (each word encoded once, however many
    * billion times it occurs), and the stats join re-keys vocab-sized
    * frames only. The rule table is driver-side M rows (the q94
    * posture) compiled INTO the projection — no join against rules, no
    * per-row interpretation of the table. */
  def q111(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.Dsl.ratio4
    val rules = learnMergeRules(
      Tables.documents(spark, sfDir)
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(length(col("token")) >= 1)
        .groupBy(col("token")).agg(count(lit(1)).as("freq"))
        .select(col("freq"),
          transform(sequence(lit(1), length(col("token"))),
            i => col("token").substr(i, lit(1))).as("seq")),
      BpeMerges).map(r => (r._2, r._3))
    val perWord = Tables.documents(spark, sfDir)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) >= 1)
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("cnt"))
    val encoded = perWord.select(col("token")).distinct()
      .select(col("token"), size(encodeWith(col("token"), rules)).as("n_sym"))
    perWord.join(encoded, Seq("token"))
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * length(col("token"))).as("n_chars"),
        sum(col("cnt") * col("n_sym")).as("n_tokens"))
      .select(col("source"), col("n_words"), col("n_chars"), col("n_tokens"),
        ratio4(col("n_chars"), col("n_tokens")).as("cpt4"))
      .orderBy(col("source"))
  }

  /** The BPE forward pass as one column expression: split a word into
    * characters, then fold each (a, b) rule over it in order. With zero
    * rules this IS the character baseline — the q111 law anchor. */
  private[graft] def encodeWith(token: Column, rules: Seq[(String, String)]): Column =
    rules.foldLeft(
      transform(sequence(lit(1), length(token)), i => token.substr(i, lit(1)))) {
      case (seq, (a, b)) => mergePair(seq, a, b)
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
