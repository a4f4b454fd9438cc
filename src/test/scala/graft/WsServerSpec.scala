package graft

import java.io.{DataInputStream, InputStream, OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.functions.TimeCryptoProof
import graft.serde.AvroBridge
import graft.serving.{ChangeFeed, WsServer}

/** RFC 6455 push transport over REAL loopback sockets: a hand-rolled
  * client does the upgrade handshake (and validates Sec-WebSocket-Accept),
  * receives CDC text frames, exchanges ping/pong and close, and — in
  * binary mode — parses the reference's Avro wire frame (magic 0 +
  * 4-byte schema id) from binary WebSocket frames
  * (ws-client/.../WebSocketClient.java onMessage byte[] path). */
class WsServerSpec extends AnyFlatSpec with Matchers {

  // ---- minimal raw-socket WS client ----

  private def maskedFrame(opcode: Int, payload: Array[Byte]): Array[Byte] = {
    require(payload.length < 126, "test client keeps frames short")
    val mask = Array[Byte](1, 2, 3, 4)
    Array[Byte]((0x80 | opcode).toByte, (0x80 | payload.length).toByte) ++ mask ++
      payload.zipWithIndex.map { case (b, i) => (b ^ mask(i % 4)).toByte }
  }

  private def readServerFrame(in: InputStream): (Int, Array[Byte]) = {
    val d = new DataInputStream(in)
    val b0 = d.readUnsignedByte()
    val b1 = d.readUnsignedByte()
    (b1 & 0x80) shouldBe 0 // server frames are unmasked
    val len = (b1 & 0x7f) match {
      case 126 => d.readUnsignedShort()
      case 127 => d.readLong().toInt
      case n => n
    }
    val p = new Array[Byte](len)
    d.readFully(p)
    (b0 & 0x0f, p)
  }

  private def connect(port: Int, target: String): (Socket, InputStream, OutputStream) = {
    val sock = new Socket("127.0.0.1", port)
    sock.setSoTimeout(5000)
    val out = sock.getOutputStream
    val secKey = Base64.getEncoder.encodeToString("0123456789abcdef".getBytes(UTF_8))
    out.write((s"GET $target HTTP/1.1\r\nHost: 127.0.0.1\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Key: $secKey\r\nSec-WebSocket-Version: 13\r\n\r\n").getBytes(UTF_8))
    out.flush()
    val in = sock.getInputStream
    // read the HTTP response head (status + headers up to the blank line)
    val head = new StringBuilder
    var prev4 = ""
    while (!prev4.endsWith("\r\n\r\n")) {
      val c = in.read()
      c should be >= 0
      head.append(c.toChar)
      prev4 = head.takeRight(4).toString
    }
    val response = head.toString
    if (response.startsWith("HTTP/1.1 101")) {
      // validate the accept key: base64(sha1(key ‖ GUID))
      val expect = Base64.getEncoder.encodeToString(
        java.security.MessageDigest.getInstance("SHA-1")
          .digest((secKey + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(UTF_8)))
      response should include(s"Sec-WebSocket-Accept: $expect")
    } else sock.close()
    (if (response.startsWith("HTTP/1.1 101")) sock else null, in, out)
  }

  "WsServer" should "push buffered and live CDC changes as text frames" in {
    val feed = new ChangeFeed()
    feed.append("k1", """{"v":1}""")
    val ws = new WsServer(feed).start()
    try {
      val (sock, in, out) = connect(ws.port, "/ws/watch/k1?from=0")
      sock should not be null
      val (op1, p1) = readServerFrame(in)
      op1 shouldBe 1
      new String(p1, UTF_8) shouldBe """{"seq":1,"value":{"v":1}}"""
      feed.append("k1", """{"v":2}""") // appended AFTER subscribe: live push
      feed.append("k2", """{"v":9}""") // different key: must NOT arrive
      val (_, p2) = readServerFrame(in)
      new String(p2, UTF_8) shouldBe """{"seq":2,"value":{"v":2}}"""
      // ping → pong with echoed payload
      out.write(maskedFrame(9, "hb".getBytes(UTF_8))); out.flush()
      val (opPong, pPong) = readServerFrame(in)
      opPong shouldBe 10
      new String(pPong, UTF_8) shouldBe "hb"
      // close → close echo, then EOF
      out.write(maskedFrame(8, Array.empty)); out.flush()
      readServerFrame(in)._1 shouldBe 8
      sock.close()
    } finally ws.stop()
  }

  it should "resume from a seq cursor like the HTTP /watch poll" in {
    val feed = new ChangeFeed()
    feed.append("k", """"a"""")
    feed.append("k", """"b"""")
    feed.append("k", """"c"""")
    val ws = new WsServer(feed).start()
    try {
      val (sock, in, _) = connect(ws.port, "/ws/watch/k?from=2")
      sock should not be null
      new String(readServerFrame(in)._2, UTF_8) shouldBe """{"seq":3,"value":"c"}"""
      sock.close()
    } finally ws.stop()
  }

  it should "enforce the signed-URL auth on the upgrade request" in {
    val salt = "000102030405060708090A0B0C0D0E0F"
    val now = 1704844830L
    val feed = new ChangeFeed()
    val ws = new WsServer(feed, saltHex = Some(salt), clock = () => now).start()
    try {
      val (unsigned, _, _) = connect(ws.port, "/ws/watch/k")
      unsigned shouldBe null // 401, no upgrade
      val sig = TimeCryptoProof.sign("/ws/watch/k", salt, TimeCryptoProof.wholeMinute(now))
      val (signed, _, _) = connect(ws.port, s"/ws/watch/k?signature=$sig")
      signed should not be null
      signed.close()
    } finally ws.stop()
  }

  it should "push registry-framed binary messages the reference client can parse" in {
    val feed = new ChangeFeed()
    feed.append("k", """{"v":1}""")
    // binary mode: payload = reference wire frame (magic 0 + schema id 7)
    val ws = new WsServer(feed,
      binaryEncoder = Some(json => AvroBridge.frame(json.getBytes(UTF_8), 7))).start()
    try {
      val (sock, in, _) = connect(ws.port, "/ws/watch/k?from=0")
      sock should not be null
      val (op, payload) = readServerFrame(in)
      op shouldBe 2 // binary
      val (schemaId, body) = AvroBridge.unframe(payload) // magic checked inside
      schemaId shouldBe 7
      new String(body, UTF_8) shouldBe """{"seq":1,"value":{"v":1}}"""
      sock.close()
    } finally ws.stop()
  }

  it should "404 unknown paths without upgrading" in {
    val ws = new WsServer(new ChangeFeed()).start()
    try {
      val (sock, _, _) = connect(ws.port, "/nope")
      sock shouldBe null
    } finally ws.stop()
  }
}
