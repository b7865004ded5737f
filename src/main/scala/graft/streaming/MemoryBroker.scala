package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** In-memory broker for [[BnplPipeline]] (r11 verdict item 5): the s01
  * ingest had only ever read files, although the reference's poll loop is
  * source-agnostic (consumer/consumer.go:75-96 — it consumes whatever the
  * iterator yields). This drives the SAME CQRS cascade from Spark's
  * MemoryStream instead of the file source, proving the pipeline is not
  * file-coupled at zero dependency cost (no Kafka jar ships, SURVEY §0).
  *
  * Wire format parity: the broker carries raw JSON LINES — exactly what
  * the file producer writes — parsed by the same [[Envelope.schema]], so
  * a pipeline fed the same lines through either transport computes the
  * same batches (the StreamingSpec source-parity law). The
  * derived-promise self-loop posts back into the stream like the
  * reference's producer re-publish (consumer/consumer.go:142-144):
  * `MemoryStream.addData` is a driver API, so the republish collects the
  * batch's derived promises first — bounded by the batch's purchase
  * count, and a seam a real deployment replaces with a broker producer,
  * not a scale path.
  */
object MemoryBroker {

  /** Returns (publish, brokerArg): `publish` feeds JSON lines into the
    * stream (the test's producer); `brokerArg` plugs into
    * [[BnplPipeline]]'s `broker` parameter. */
  def apply(spark: SparkSession): (Seq[String] => Unit, (DataFrame, DataFrame => Unit)) = {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[String] =
      org.apache.spark.sql.Encoders.STRING
    val stream = MemoryStream[String]
    val df = stream.toDF()
      .select(from_json(col("value"), Envelope.schema).as("e"))
      .select(col("e.*"))
    val publish = (lines: Seq[String]) =>
      if (lines.nonEmpty) { stream.addData(lines); () }
    val repub = (batch: DataFrame) => publish(batch.toJSON.collect().toSeq)
    (publish, (df, repub))
  }
}
