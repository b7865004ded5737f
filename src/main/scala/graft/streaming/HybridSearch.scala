package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dsl.{cosine, round4}
import graft.queries.RetrievalEval

/** s32: streaming HYBRID SEARCH — q148's reciprocal-rank fusion served
  * from the two incremental stores the engine already maintains: the
  * lexical list is BM25 over the s15 posting store (s18's search — the
  * SAME `Text.bm25Rank` kernel batch q92 runs), the semantic list is the
  * exact cosine ranking over the s17 vector store's LWW-resolved
  * membership, and the fusion is `RetrievalEval.rrfFuse` — one shared
  * definition per kernel, so batch/stream parity is by construction,
  * not by re-implementation. This is the serving path of a RAG stack
  * whose corpus ingests continuously: both indexes ingest in
  * micro-batches (upserts included, each store's own LWW discipline),
  * and the fused top-k read at time t sees exactly the documents
  * ingested by t.
  *
  * Scale posture: inherits the stores' read paths (posting-store scan
  * is term-filtered; the member scan is one pass feeding a broadcast
  * single-row query vector); both candidate lists are TopK-bounded
  * before the fusion touches them, so the fusion itself stays
  * corpus-size-independent exactly as in batch q148.
  */
object HybridSearch {

  /** Fused top-k over the current store states: BM25 on the default
    * query terms from `indexStore` (s15) ⊕ cosine against the stored
    * vector `queryVecId` from `vectorStore` (s17). */
  def search(spark: SparkSession, indexStore: String, vectorStore: String,
      queryVecId: Long = 0L): DataFrame = {
    val lex = IncrementalIndex.search(spark, indexStore)
      .select(col("doc_id"), col("bm25"))
    // the member view feeds both the query-vector lookup and the scan it
    // broadcasts into (self-join shape) — pin one evaluation (q104
    // discipline)
    val members = VectorIndex.currentMembers(spark, vectorStore)
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(true)
    val qv = members.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qvec"))
    val sem = members.join(broadcast(qv))
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id").as("doc_id"),
        round4(cosine(col("embedding"), col("qvec"))).as("sim"))
      .orderBy(col("sim").desc, col("doc_id"))
      .limit(RetrievalEval.HybridTopK)
    RetrievalEval.rrfFuse(lex, sem)
  }
}
