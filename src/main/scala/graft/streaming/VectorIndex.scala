package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Dsl.{cosine, round4}
import graft.queries.Vectors

/** s17: streaming IVF vector index — the PRODUCTION form of the q55/q56/
  * q90 batch family, completing for vectors what s15 does for text: the
  * coarse quantizer (codebook) is trained offline and held static (the
  * universal IVF deployment shape — retraining is a batch event, not a
  * stream operation), embeddings arrive as a micro-batch stream, and the
  * cell-membership postings are maintained incrementally so queries probe
  * the index instead of re-assigning the corpus.
  *
  * `foreachBatch` assigns each batch against the broadcast codebook with
  * the SAME [[Vectors.assign]] kernel the batch queries use (one
  * tie-break definition — csim DESC, cell ASC — everywhere), and writes
  * (vec_id, cell, embedding) into the batch's own `batch_id` partition.
  * Like s15 and unlike s14, the upsert never reads the store (a batch's
  * assignments are a pure function of batch × codebook), so replay
  * safety is the write discipline alone: dynamic-partition-overwrite of
  * the batch's own partition. A re-streamed vec_id is an UPDATE — the
  * read view resolves last-writer-wins per vec_id, and compaction folds
  * the store to one LWW-resolved base partition with s15's crash
  * argument (base commits before any delete; an undeleted winner
  * partition carries exactly the rows the base stored for it, so every
  * intermediate state reads identically).
  *
  * Scale posture: per batch, work is one broadcast-codebook map-side
  * similarity pass + one row_number shuffle on vec_id (batch-sized, not
  * corpus-sized) + an append-sized partition write. The probe mirrors
  * q56: rank ncells centroids against the query (broadcast, O(ncells)),
  * semi-join the NProbe surviving cells against the store — the scan is
  * Σ|probed cells|, never |corpus| — and TakeOrdered the exact cosines.
  * Cell-skew on the probe join is q90's known hazard; its salting applies
  * unchanged if a deployment's cells grow hot. */
object VectorIndex {

  /** Fold the store's base partition every this-many batches. */
  val CompactEvery = 8L

  /** One micro-batch upsert: assign against the static codebook, land in
    * this batch's own partition. Exposed for direct testing. */
  def processBatch(batch: DataFrame, cells: DataFrame, storeDir: String,
      batchId: Long): Unit = {
    if (batch.isEmpty) return
    if (batchId > 0 && batchId % CompactEvery == 0)
      compactStore(batch.sparkSession, storeDir, batchId)
    Vectors.assign(batch.select(col("vec_id"), col("embedding")), cells)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(storeDir)
  }

  /** The index's current membership after per-vector LWW resolution —
    * (vec_id, embedding, cell), one version per vector. */
  def currentMembers(spark: SparkSession, storeDir: String): DataFrame = {
    val wv = Window.partitionBy(col("vec_id"))
    spark.read.parquet(storeDir)
      .select(col("vec_id"), col("embedding"), col("cell"),
        col("batch_id").cast("long").as("batch_id"))
      .withColumn("mx", max(col("batch_id")).over(wv))
      .filter(col("batch_id") === col("mx"))
      .select(col("vec_id"), col("embedding"), col("cell"))
  }

  /** q56's probe against the streamed store: the stored vector `qId`
    * ranks the codebook cells, its NProbe nearest are semi-joined against
    * the membership, and the survivors rank by exact cosine — top k. */
  def probe(spark: SparkSession, storeDir: String, cells: DataFrame,
      qId: Long, k: Int): DataFrame = {
    val cur = currentMembers(spark, storeDir)
    val qv = cur.filter(col("vec_id") === qId).select(col("embedding").as("qvec"))
    val qcells = cells.crossJoin(broadcast(qv))
      .select(col("cell"), cosine(col("cvec"), col("qvec")).as("csim"))
      .orderBy(col("csim").desc, col("cell")).limit(Vectors.NProbe)
      .select(col("cell"))
    cur.join(broadcast(qcells), Seq("cell"))
      .filter(col("vec_id") =!= qId)
      .join(broadcast(qv))
      .select(col("vec_id"), col("cell"),
        round4(cosine(col("embedding"), col("qvec"))).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Fold every committed store partition (0 ≤ batch_id < upToBatch) plus
    * the previous base into ONE LWW-resolved base partition
    * (batch_id = −1), then delete the folded partitions — s15's fold with
    * s15's failure analysis (the base lands before any delete; every
    * intermediate state's per-vector max-batch rows equal the base's). */
  def compactStore(spark: SparkSession, storeDir: String, upToBatch: Long): Unit = {
    import org.apache.hadoop.fs.{FileSystem, Path}
    val dir = new Path(storeDir)
    val fs = FileSystem.get(dir.toUri, spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return
    val folded = fs.listStatus(dir).map(_.getPath).filter { p =>
      p.getName.startsWith("batch_id=") &&
        scala.util.Try(p.getName.stripPrefix("batch_id=").toLong)
          .toOption.exists(v => v >= 0 && v < upToBatch)
    }
    if (folded.isEmpty) return
    val wv = Window.partitionBy(col("vec_id"))
    val base = spark.read.parquet(storeDir)
      .select(col("vec_id"), col("embedding"), col("cell"),
        col("batch_id").cast("long").as("batch_id"))
      .filter(col("batch_id") < upToBatch) // includes the previous base (−1)
      .withColumn("mx", max(col("batch_id")).over(wv))
      .filter(col("batch_id") === col("mx"))
      .select(col("vec_id"), col("embedding"), col("cell"))
      .localCheckpoint(true) // pin: the overwrite below rewrites the source path
    base.withColumn("batch_id", lit(-1L))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(storeDir)
    folded.foreach(p => fs.delete(p, true))
  }

  /** Wire a streaming (vec_id, embedding, …) source into the index. */
  def start(vecs: DataFrame, cells: DataFrame, storeDir: String,
      checkpointDir: String): StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, cells, storeDir, batchId)
      }
      .start()
}
