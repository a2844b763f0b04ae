package graft

import java.io.ByteArrayInputStream
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import graft.streaming.{EventPipeline, TxHashBroadcastServer, WebSocket}
import org.apache.spark.sql.streaming.StreamingQueryException

/** RFC 6455 framing adapter: handshake vectors from the RFC itself,
  * frame round-trips across the three length encodings, and both wire
  * surfaces end-to-end — a websocket subscriber on the tx-hash broadcast
  * and the `graft-live` source over `transport=websocket`.
  */
class WebSocketSpec extends SparkSpec {

  test("Sec-WebSocket-Accept matches the RFC 6455 published example") {
    // §1.3: "dGhlIHNhbXBsZSBub25jZQ==" → "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="
    assert(WebSocket.acceptKeyOf("dGhlIHNhbXBsZSBub25jZQ==") ===
      "s3pPLMBiTxaQ9kYGzzhZRbK+xOo=")
  }

  test("frame round-trips: 7/16/64-bit lengths, masked and unmasked") {
    val mask = Some(Array[Byte](0x01, 0x02, 0x03, 0x04))
    for {
      n <- Seq(0, 1, 125, 126, 300, 65535, 65536, 70000)
      m <- Seq(None, mask)
    } {
      val payload = Array.tabulate[Byte](n)(i => (i % 251).toByte)
      val bytes = WebSocket.frame(WebSocket.OpText, payload, m)
      val Some((op, got)) = WebSocket.readFrame(new ByteArrayInputStream(bytes))
      assert(op === WebSocket.OpText, s"n=$n masked=${m.isDefined}")
      assert(got.toSeq === payload.toSeq, s"n=$n masked=${m.isDefined}")
    }
  }

  test("readTextMessage: answers ping, skips pong, stops at close") {
    val out = new java.io.ByteArrayOutputStream()
    val stream = new java.io.ByteArrayOutputStream()
    stream.write(WebSocket.frame(WebSocket.OpPing, "hi".getBytes, None))
    stream.write(WebSocket.frame(WebSocket.OpPong, Array.emptyByteArray, None))
    stream.write(WebSocket.textFrame("payload"))
    stream.write(WebSocket.frame(WebSocket.OpClose, Array.emptyByteArray, None))
    val in = new ByteArrayInputStream(stream.toByteArray)
    assert(WebSocket.readTextMessage(in, out) === Some("payload"))
    assert(WebSocket.readTextMessage(in, out) === None) // close frame
    // the pong answer to our ping went out before the text was returned
    val replies = new ByteArrayInputStream(out.toByteArray)
    val Some((op, body)) = WebSocket.readFrame(replies)
    assert(op === WebSocket.OpPong && new String(body) === "hi")
  }

  test("tx-hash broadcast serves websocket subscribers: handshake, frames, reorg sentinel") {
    val srv = new TxHashBroadcastServer(webSocket = true)
    val sock = new Socket(InetAddress.getLoopbackAddress, srv.boundPort)
    sock.setSoTimeout(30000)
    try {
      WebSocket.clientHandshake(sock.getInputStream, sock.getOutputStream,
        s"127.0.0.1:${srv.boundPort}")
      // registration is async to the handshake; wait until the server holds us
      val deadline = System.nanoTime() + 10e9.toLong
      while (srv.connectionCount < 1 && System.nanoTime() < deadline) Thread.sleep(10)
      assert(srv.connectionCount === 1)
      srv.broadcastImported(Iterator(42L, 43L))
      val msg = WebSocket.readTextMessage(sock.getInputStream, sock.getOutputStream)
      assert(msg === Some("[" + f""""0x${42L}%064x"""" + "," + f""""0x${43L}%064x"""" + "]"))
      srv.broadcastReorg()
      val sentinel = WebSocket.readTextMessage(sock.getInputStream, sock.getOutputStream)
      assert(sentinel === Some(s"""["${EventPipeline.ReorgMagicHash}"]"""))
    } finally { sock.close(); srv.stop() }
  }

  /** Websocket feed server: handshake, read the masked subscribe frame,
    * push script lines one text frame each, keep the connection open.
    */
  private final class WsFeedServer(script: Long => Seq[String]) {
    private val server = new ServerSocket(0, 50, InetAddress.getLoopbackAddress)
    val subscribes = new ConcurrentLinkedQueue[Long]()
    @volatile private var running = true
    private val t = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          val in = sock.getInputStream
          val out = sock.getOutputStream
          assert(WebSocket.serverHandshake(in, out), "client must upgrade")
          val req = WebSocket.readTextMessage(in, out).getOrElse("")
          val from = """"subscribe"\s*:\s*(\d+)""".r
            .findFirstMatchIn(req).map(_.group(1).toLong).getOrElse(0L)
          subscribes.add(from)
          script(from).foreach(l => out.write(WebSocket.textFrame(l)))
          out.flush()
        } catch { case _: Throwable if !running => case _: java.io.IOException => }
      }
    }, "ws-feed-server")
    t.setDaemon(true)
    t.start()
    def port: Int = server.getLocalPort
    def stop(): Unit = { running = false; server.close() }
  }

  private val baseUs = 1700000000000000L
  private def ev(block: Long, id: Long, n: Long): String =
    s"""{"block":$block,"event_id":$id,"ts_us":${baseUs + id},""" +
      s""""user_id":1,"event_type":"transfer","value":1.0,"n_in_block":$n}"""

  test("graft-live over transport=websocket: subscribe frame, event rows, reorg contract") {
    val feed = new WsFeedServer(from => Seq(
      ev(from, from * 10, 2), ev(from, from * 10 + 1, 2),
      ev(from + 1, (from + 1) * 10, 1)))
    val root = java.nio.file.Files.createTempDirectory("wslive").toFile.getAbsolutePath
    try {
      val events = spark.readStream.format("graft-live")
        .option("host", "127.0.0.1").option("port", feed.port)
        .option("subscribeFrom", 5L).option("idleTimeoutMs", 600000)
        .option("transport", "websocket")
        .load()
      val q = events.writeStream.format("memory").queryName("ws_live")
        .option("checkpointLocation", s"$root/ck").start()
      try {
        val deadline = System.nanoTime() + 60e9.toLong
        while (spark.table("ws_live").count() < 3 && System.nanoTime() < deadline)
          Thread.sleep(100)
        val rows = spark.table("ws_live")
          .select("block", "event_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(rows === Set((5L, 50L), (5L, 51L), (6L, 60L)))
        assert(feed.subscribes.peek() === 5L)
      } finally q.stop()

      // the reorg line rides the same frames and fails the stream with the
      // restart contract
      val feed2 = new WsFeedServer(_ => Seq(ev(1, 11, 1), """{"reorg":1}"""))
      try {
        val ev2 = spark.readStream.format("graft-live")
          .option("host", "127.0.0.1").option("port", feed2.port)
          .option("subscribeFrom", 1L).option("idleTimeoutMs", 600000)
          .option("transport", "websocket")
          .load()
        val q2 = ev2.writeStream.format("noop")
          .option("checkpointLocation", s"$root/ck2").start()
        val e = intercept[StreamingQueryException] { q2.awaitTermination() }
        assert(graft.sources.LiveBlockSource.reorgBlockOf(e) === Some(1L))
      } finally feed2.stop()
    } finally feed.stop()
  }
}
