package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time-based crypto proof (SURVEY §2.6h) — the reference's salted,
  * minute-windowed SHA-256 request signature
  * (api/.../util/TimeCryptoProof.java:96-168,
  * TimeCryptoProofSHA256.java:47-51): `sign(arg) = SHA-256(salt ‖
  * bigEndianInt64(utcWholeMinuteSeconds) ‖ utf8(arg))`, verified against
  * the current minute window ± 1.
  *
  * Deliberate departures, all Spark-first:
  *   - time is INJECTED (explicit minute-aligned epoch seconds, value or
  *     column), never read from a wall clock inside an expression — plans
  *     stay deterministic, cacheable and replayable; the caller supplies
  *     "now" once per request/batch.
  *   - the ENGINE-CANONICAL preimage is the hex-string form
  *     `SALT_HEX ‖ LPAD(HEX(minute),16,'0') ‖ arg` (all uppercase hex):
  *     same security properties (salted, time-windowed SHA-256), but the
  *     preimage is pure ASCII, so the signature is computable by ANY
  *     engine with a string sha256 — Spark's codegen'd `sha2` and the
  *     DuckDB oracle produce bit-identical columns, no UDF anywhere.
  *   - the reference's exact BYTE-level frame (salt ‖ BE64 ‖ utf8) is kept
  *     as `signWire`/`verifyWire` for wire compatibility with existing
  *     affinity gateways (its NUL bytes make it inexpressible through
  *     engines whose sha256 takes strings — spec-covered instead).
  */
object TimeCryptoProof {

  private val HexArray = "0123456789ABCDEF".toCharArray

  /** Uppercase hex, reference `toHex` parity (TimeCryptoProof.java:37-46). */
  def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var j = 0
    while (j < bytes.length) {
      val v = bytes(j) & 0xff
      out(j * 2) = HexArray(v >>> 4)
      out(j * 2 + 1) = HexArray(v & 0x0f)
      j += 1
    }
    new String(out)
  }

  def fromHex(hex: String): Array[Byte] = {
    require(hex.length % 2 == 0, "hex string must have even length")
    val out = new Array[Byte](hex.length / 2)
    var i = 0
    while (i < hex.length) {
      out(i / 2) = ((Character.digit(hex.charAt(i), 16) << 4)
        + Character.digit(hex.charAt(i + 1), 16)).toByte
      i += 2
    }
    out
  }

  /** Floor an epoch-seconds instant to its whole minute (the reference's
    * `utcInWholeMinutes` with the wall-clock read factored out). */
  def wholeMinute(epochSec: Long): Long = (epochSec / 60L) * 60L

  private def sha256(parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance("SHA-256")
    parts.foreach(d.update)
    d.digest()
  }

  // ── engine-canonical (hex-preimage, oracle-portable) form ──────────────

  /** Canonical signature: `SHA-256(utf8(SALT_HEX ‖ LPAD(HEX(minute),16,0)
    * ‖ arg))`, uppercase hex output. `minuteSec` must be minute-aligned
    * (use [[wholeMinute]]) and non-negative. */
  def sign(arg: String, saltHex: String, minuteSec: Long): String = {
    require(minuteSec >= 0, s"minuteSec must be non-negative: $minuteSec")
    val preimage = saltHex.toUpperCase + f"$minuteSec%016X" + arg
    toHex(sha256(preimage.getBytes(StandardCharsets.UTF_8)))
  }

  /** Constant-time hex-signature comparison (MessageDigest.isEqual) — this
    * sits on the Gateway's auth path, where String.== would leak a
    * prefix-match timing channel. */
  private def ctEquals(a: String, b: String): Boolean =
    MessageDigest.isEqual(
      a.getBytes(StandardCharsets.UTF_8), b.getBytes(StandardCharsets.UTF_8))

  /** Reference `verify` semantics (TimeCryptoProof.java:171-179) over the
    * canonical form: valid if the signature matches the supplied minute
    * window or either neighbor — ±1-minute clock-skew tolerance. */
  def verify(signature: String, arg: String, saltHex: String, nowSec: Long): Boolean = {
    val m = wholeMinute(nowSec)
    Seq(0L, -60L, 60L).exists(off => ctEquals(sign(arg, saltHex, m + off), signature))
  }

  /** The reference PHP example's `signURL`
    * (TimeCryptoProofSHA256.java:100 comment): append
    * `&signature=urlencode(apiKey:sign(path))`. */
  def signUrl(url: String, apiKey: String, saltHex: String, nowSec: Long): String = {
    val path = new java.net.URI(url).getPath
    val sig = sign(path, saltHex, wholeMinute(nowSec))
    val enc = java.net.URLEncoder.encode(s"$apiKey:$sig", "UTF-8")
    s"$url&signature=$enc"
  }

  /** Column form of [[sign]] — codegen'd built-ins only, no UDF: signing
    * rides the parquet scan at whole-stage-codegen speed. `hex()` emits
    * uppercase in Spark; `upper` pins it for engine portability. */
  def signCol(arg: Column, saltHex: String, minuteSec: Column): Column =
    upper(sha2(
      concat(
        lit(saltHex.toUpperCase),
        lpad(upper(hex(minuteSec)), 16, "0"),
        arg),
      256))

  // ── reference wire-format (byte-level) form ────────────────────────────

  /** Byte-exact reference frame: `SHA-256(salt ‖ BE64(minuteSec) ‖
    * utf8(arg))` (TimeCryptoProof.java:160-168). For wire compatibility
    * with an existing affinity gateway deployment. */
  def signWire(arg: String, salt: Array[Byte], minuteSec: Long): String = {
    val ts = ByteBuffer.allocate(8).putLong(minuteSec).array()
    toHex(sha256(salt, ts, arg.getBytes(StandardCharsets.UTF_8)))
  }

  /** Deterministic salted hash, no time component: `SHA-256(salt ‖ arg)`
    * — reference `hash` (TimeCryptoProof.java:102-109). */
  def saltedHashWire(arg: String, salt: Array[Byte]): String =
    toHex(sha256(salt, arg.getBytes(StandardCharsets.UTF_8)))

  def verifyWire(signature: String, arg: String, salt: Array[Byte], nowSec: Long): Boolean = {
    val m = wholeMinute(nowSec)
    Seq(0L, -60L, 60L).exists(off => ctEquals(signWire(arg, salt, m + off), signature))
  }
}
