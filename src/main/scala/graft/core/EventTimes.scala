package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Event-time parsing and fixed-width key coercions (§2.6 serde functions).
  *
  * The reference parses event times from ISO-offset strings and a legacy
  * `dd.MM.yyyy HH:mm:ssx` pattern (api/.../util/EventTime.java:92-102), and
  * coerces fixed-width big-endian key fields to/from ints, longs and hex
  * (api/.../util/ByteUtils.java, @Fixed annotations in AvroRecord). All
  * re-expressed with codegen'd built-ins.
  */
object EventTimes {

  /** Parse either ISO-8601-with-offset or the reference's legacy
    * `dd.MM.yyyy HH:mm:ssx` format → epoch microseconds. */
  def parseEventTimeUs(s: Column): Column =
    unix_micros(coalesce(
      try_to_timestamp(s),
      try_to_timestamp(s, lit("dd.MM.yyyy HH:mm:ssx"))))

  /** Fixed(4) big-endian bytes of an int key — the reference's
    * order-preserving binary key prefix. Negative ints encode as their
    * unsigned 32-bit two's complement (the 0xFFFFFFFF mask is required:
    * Spark's hex() promotes int to bigint, and lpad TRUNCATES a 16-char hex
    * to its leftmost 8 — every negative key would collide to 0xFFFFFFFF).
    * NB the byte-order ≡ numeric-order property only holds for
    * non-negative keys (negatives hex-sort above positives). */
  def intToFixed(c: Column): Column =
    to_binary(lpad(hex(c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))), 8, "0"), lit("hex"))

  /** Fixed(8) big-endian bytes of a long key (two's complement for
    * negatives; ordering property holds for non-negative keys). */
  def longToFixed(c: Column): Column =
    to_binary(lpad(hex(c.cast("long")), 16, "0"), lit("hex"))

  /** Inverse of longToFixed: signed 64-bit interpretation (conv toBase -10),
    * so negative longs round-trip without ANSI overflow. 4-byte inputs
    * decode to their unsigned 32-bit value, matching intToFixed's mask. */
  def fixedToLong(c: Column): Column = conv(hex(c), 16, -10).cast("long")

  /** Canonical lowercase-hex rendering of binary keys (UUID-style). */
  def toHexString(c: Column): Column = lower(hex(c))
}
