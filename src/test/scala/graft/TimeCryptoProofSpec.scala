package graft

import java.nio.ByteBuffer
import java.security.MessageDigest

import graft.functions.TimeCryptoProof
import org.apache.spark.sql.functions._

/** §2.6h crypto proof — port of the reference's TimeCryptoProofSpec
  * property matrix (core/.../util/TimeCryptoProofSpec.scala:40-100) plus
  * column↔driver parity for the engine-canonical hex-preimage form. */
class TimeCryptoProofSpec extends SparkSpec {
  import spark.implicits._

  private val saltHex = "000102030405060708090A0B0C0D0E0F"
  private val salt = TimeCryptoProof.fromHex(saltHex)

  "hex conversion" should "be reversible for all byte values (reference property 1)" in {
    val bytes = (0 until 256).map(_.toByte).toArray
    TimeCryptoProof.fromHex(TimeCryptoProof.toHex(bytes)) shouldBe bytes
    TimeCryptoProof.toHex(Array(0x0f.toByte, 0xa0.toByte)) shouldBe "0FA0"
  }

  "sign/verify" should "hold for the current window and both neighbors (reference verify:171-179)" in {
    val now = 1704844830L // mid-minute
    val sig = TimeCryptoProof.sign("/api/x", saltHex, TimeCryptoProof.wholeMinute(now))
    TimeCryptoProof.verify(sig, "/api/x", saltHex, now) shouldBe true
    TimeCryptoProof.verify(sig, "/api/x", saltHex, now + 60) shouldBe true // +1 window
    TimeCryptoProof.verify(sig, "/api/x", saltHex, now - 60) shouldBe true // -1 window
    TimeCryptoProof.verify(sig, "/api/x", saltHex, now + 121) shouldBe false // +2: expired
    TimeCryptoProof.verify(sig, "/api/y", saltHex, now) shouldBe false // wrong arg
    TimeCryptoProof.verify(sig, "/api/x", "FF" * 16, now) shouldBe false // wrong salt
  }

  it should "produce different signatures for different salts (reference property 4)" in {
    val m = 1704844800L
    TimeCryptoProof.sign("/xyz", saltHex, m) should not be
      TimeCryptoProof.sign("/xyz", "FEDCBA98765432100123456789ABCDEF", m)
  }

  "signWire" should "frame exactly salt ‖ BE64(minute) ‖ utf8(arg) (reference sign:160-168)" in {
    val minute = 1704844800L
    // independent construction of the reference's byte frame
    val arg = "/api/events/click/1".getBytes("UTF-8")
    val buf = ByteBuffer.allocate(salt.length + 8 + arg.length)
    buf.put(salt).putLong(minute).put(arg)
    val expected = TimeCryptoProof.toHex(
      MessageDigest.getInstance("SHA-256").digest(buf.array()))
    TimeCryptoProof.signWire("/api/events/click/1", salt, minute) shouldBe expected
    TimeCryptoProof.verifyWire(expected, "/api/events/click/1", salt, minute + 59) shouldBe true
    TimeCryptoProof.verifyWire(expected, "/api/events/click/1", salt, minute + 121) shouldBe false
  }

  "signUrl" should "append urlencoded apiKey:signature (reference PHP example)" in {
    val url = "https://example.com/xyz?param=123456"
    val signed = TimeCryptoProof.signUrl(url, "key1", saltHex, 1704844830L)
    signed should startWith(url + "&signature=key1%3A")
    val sig = signed.split("%3A").last
    TimeCryptoProof.verify(sig, "/xyz", saltHex, 1704844830L) shouldBe true
  }

  it should "hold sign/verify for 200 seeded random (salt, arg) pairs (reference property 2)" in {
    // the reference sweeps random salts x alpha strings with scalacheck
    // (TimeCryptoProofSpec.scala:48-67); same matrix via the repo's seeded
    // Sampled idiom (no scalatest-scalacheck bridge in the offline cache)
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { i =>
      val sBytes = new Array[Byte](16); rnd.nextBytes(sBytes)
      val sHex = TimeCryptoProof.toHex(sBytes)
      // varied args: random length 0-40 (empty included), full printable
      // ASCII range — spaces, slashes, punctuation
      val arg = (0 until rnd.nextInt(41)).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
      val now = math.abs(rnd.nextLong() % 4102444800L) // < year 2100
      val sig = TimeCryptoProof.sign(arg, sHex, TimeCryptoProof.wholeMinute(now))
      withClue(s"salt=$sHex arg=$arg now=$now") {
        TimeCryptoProof.verify(sig, arg, sHex, now) shouldBe true
        TimeCryptoProof.verify(sig, arg + "x", sHex, now) shouldBe false
        val wire = TimeCryptoProof.signWire(arg, sBytes, TimeCryptoProof.wholeMinute(now))
        TimeCryptoProof.verifyWire(wire, arg, sBytes, now) shouldBe true
        // hex round-trip on the random salt (reference property 1)
        TimeCryptoProof.fromHex(sHex) shouldBe sBytes
      }
    }
  }

  "signCol" should "match the driver-side sign() bit-for-bit (codegen'd, no UDF)" in {
    val rows = Seq(
      ("/api/events/click/1", 1704844800L),
      ("/api/events/view/2", 1704844860L),
      ("/api/other", 0L)).toDF("path", "minute")
    val out = rows.select(col("path"), col("minute"),
        TimeCryptoProof.signCol(col("path"), saltHex, col("minute")).as("sig"))
      .as[(String, Long, String)].collect()
    out.foreach { case (path, minute, sig) =>
      sig shouldBe TimeCryptoProof.sign(path, saltHex, minute)
    }
  }
}
