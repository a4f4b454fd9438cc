package graft.serving

import java.io.{BufferedReader, InputStream, InputStreamReader, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64

import scala.util.control.NonFatal

import graft.functions.TimeCryptoProof

/** WebSocket (RFC 6455) push endpoint for per-key CDC — the transport the
  * reference serves its key subscriptions over (core WebSocket layer +
  * ws-client/src/main/java/io/amient/affinity/ws/WebSocketClient.java:
  * text messages and registry-framed Avro binary messages), implemented
  * JDK-only on a raw socket because `com.sun.net.httpserver` cannot
  * upgrade connections. [[Gateway]]'s `/watch` remains the poll transport;
  * this is the push transport over the SAME [[ChangeFeed]].
  *
  * Protocol surface (the subset a CDC push needs):
  *   - handshake: `GET /ws/watch/{key}?from=N[&signature=..]` with
  *     `Sec-WebSocket-Key` → `101` + `Sec-WebSocket-Accept =
  *     base64(sha1(key ‖ RFC-GUID))`; same signed-URL auth as the HTTP
  *     gateway (401 + close when the signature check fails).
  *   - server→client: one unmasked TEXT frame per change
  *     (`{"seq":N,"value":...}`), or BINARY frames when a `binaryEncoder`
  *     is given (the reference's Avro wire: magic 0 + 4-byte schema id +
  *     payload — build payloads with `serde.AvroBridge.frame`).
  *   - client→server: masked frames per RFC; PING answered with PONG
  *     (echoed payload), CLOSE echoed then the socket closes. Client text
  *     frames are ignored (subscription is in the URL, as in the
  *     reference's key-addressed endpoints).
  *
  * Scale contract: identical to [[Gateway]] — this pushes BOUNDED change
  * buffers for snapshot-sized stores; it is a serving-tier component, not
  * a data-plane operator. One thread per connection (a test/serving
  * gateway, not a C10K server). */
final class WsServer(
    feed: ChangeFeed,
    saltHex: Option[String] = None,
    clock: () => Long = () => System.currentTimeMillis() / 1000L,
    binaryEncoder: Option[String => Array[Byte]] = None,
    pollMs: Long = 20L) {

  private val server = new ServerSocket(0, 16, InetAddress.getByName("127.0.0.1"))
  @volatile private var running = true

  def port: Int = server.getLocalPort

  // -------- frame codec (server side) --------

  /** Encode one unmasked server→client frame. `opcode`: 1 text, 2 binary,
    * 8 close, 9 ping, 10 pong. */
  private[serving] def encodeFrame(opcode: Int, payload: Array[Byte]): Array[Byte] = {
    val header =
      if (payload.length < 126) Array[Byte]((0x80 | opcode).toByte, payload.length.toByte)
      else if (payload.length < 65536)
        Array[Byte]((0x80 | opcode).toByte, 126.toByte,
          (payload.length >> 8).toByte, payload.length.toByte)
      else {
        val b = new Array[Byte](10)
        b(0) = (0x80 | opcode).toByte
        b(1) = 127.toByte
        var i = 0; while (i < 8) { b(9 - i) = ((payload.length.toLong >> (8 * i)) & 0xff).toByte; i += 1 }
        b
      }
    header ++ payload
  }

  /** Read one client frame: (opcode, payload). Client frames MUST be
    * masked (RFC 6455 §5.1); unmasked client frames fail the connection. */
  private def readFrame(in: InputStream): Option[(Int, Array[Byte])] = {
    def readByte(): Int = in.read()
    val b0 = readByte()
    if (b0 < 0) return None
    val opcode = b0 & 0x0f
    val b1 = readByte()
    if (b1 < 0) return None
    val masked = (b1 & 0x80) != 0
    var len: Long = b1 & 0x7f
    if (len == 126) len = (readByte() << 8 | readByte()).toLong
    else if (len == 127) { len = 0L; var i = 0; while (i < 8) { len = (len << 8) | readByte(); i += 1 } }
    if (!masked || len > (1L << 20)) return None // protocol violation / bound
    val mask = new Array[Byte](4)
    if (in.readNBytes(mask, 0, 4) != 4) return None
    val payload = new Array[Byte](len.toInt)
    if (in.readNBytes(payload, 0, len.toInt) != len.toInt) return None
    var i = 0
    while (i < payload.length) { payload(i) = (payload(i) ^ mask(i % 4)).toByte; i += 1 }
    Some((opcode, payload))
  }

  // -------- handshake --------

  private val WsGuid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  private[serving] def acceptKey(secKey: String): String =
    Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("SHA-1").digest((secKey + WsGuid).getBytes(UTF_8)))

  private def handshake(sock: Socket): Option[(String, Long)] = {
    val reader = new BufferedReader(new InputStreamReader(sock.getInputStream, UTF_8))
    val out = sock.getOutputStream
    val requestLine = reader.readLine()
    if (requestLine == null) return None
    var headers = Map.empty[String, String]
    var line = reader.readLine()
    while (line != null && line.nonEmpty) {
      line.split(":", 2) match {
        case Array(k, v) => headers += (k.trim.toLowerCase -> v.trim)
        case _ =>
      }
      line = reader.readLine()
    }
    val target = requestLine.split(" ").lift(1).getOrElse("")
    val (path, query) = target.split("\\?", 2) match {
      case Array(p, q) => (p, q)
      case Array(p) => (p, "")
    }
    val params = query.split('&').toSeq.flatMap(_.split("=", 2) match {
      case Array(k, v) => Some(k -> java.net.URLDecoder.decode(v, "UTF-8"))
      case _ => None
    }).toMap
    def fail(status: String): None.type = {
      out.write(s"HTTP/1.1 $status\r\nConnection: close\r\n\r\n".getBytes(UTF_8))
      out.flush()
      None
    }
    val authorized = saltHex.forall(salt => params.get("signature")
      .exists(sig => TimeCryptoProof.verify(sig, path, salt, clock())))
    if (!authorized) return fail("401 Unauthorized")
    (path.split("/").filter(_.nonEmpty).toSeq, headers.get("sec-websocket-key")) match {
      case (Seq("ws", "watch", key), Some(secKey))
          if headers.get("upgrade").exists(_.equalsIgnoreCase("websocket")) =>
        out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
          "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
          s"Sec-WebSocket-Accept: ${acceptKey(secKey)}\r\n\r\n").getBytes(UTF_8))
        out.flush()
        Some((key, params.get("from").map(_.toLong).getOrElse(0L)))
      case _ => fail("404 Not Found")
    }
  }

  // -------- per-connection push loop --------

  private def serve(sock: Socket): Unit = {
    sock.setSoTimeout(pollMs.toInt.max(1))
    handshake(sock) match {
      case None => sock.close()
      case Some((key, from)) =>
        val out = sock.getOutputStream
        var lastSeq = from
        var open = true
        def push(): Unit = feed.since(key, lastSeq).foreach { case (s, v) =>
          val json = s"""{"seq":$s,"value":$v}"""
          binaryEncoder match {
            case Some(enc) => out.write(encodeFrame(2, enc(json)))
            case None => out.write(encodeFrame(1, json.getBytes(UTF_8)))
          }
          out.flush()
          lastSeq = s
        }
        try {
          while (open && running) {
            push()
            // between pushes, drain any client frame; SoTimeout bounds the
            // block so the poll keeps its cadence
            try readFrame(sock.getInputStream) match {
              case Some((9, p)) => out.write(encodeFrame(10, p)); out.flush() // ping→pong
              case Some((8, p)) => out.write(encodeFrame(8, p)); out.flush(); open = false
              case Some(_) => () // text/binary/pong from client: ignored
              case None => open = false // EOF or protocol violation
            } catch { case _: java.net.SocketTimeoutException => () }
          }
        } catch { case NonFatal(_) => () } finally sock.close()
    }
  }

  def start(): WsServer = {
    val acceptor = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          val t = new Thread(() => serve(sock), s"ws-conn-${sock.getPort}")
          t.setDaemon(true)
          t.start()
        } catch { case NonFatal(_) => if (running) () }
      }
    }, "ws-acceptor")
    acceptor.setDaemon(true)
    acceptor.start()
    this
  }

  def stop(): Unit = {
    running = false
    try server.close() catch { case NonFatal(_) => () }
  }
}
