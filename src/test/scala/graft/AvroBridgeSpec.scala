package graft

import scala.jdk.CollectionConverters._

import graft.serde.{AvroBridge, MemorySchemaRegistry}
import org.apache.avro.Schema
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Port of the reference's serde test intent: round-trips over primitives/
  * collections/nested records (AvroRecordSpec, AvroRecordPropSpec:38-73) and
  * schema-evolution projection (AvroProjectionSpec.scala:169-202). */
class AvroBridgeSpec extends SparkSpec {

  private val nested = StructType(Seq(
    StructField("x", IntegerType, nullable = false),
    StructField("y", StringType, nullable = true)))

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("score", DoubleType, nullable = true),
    StructField("tags", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("props", MapType(StringType, IntegerType, valueContainsNull = false), nullable = false),
    StructField("blob", BinaryType, nullable = true),
    StructField("inner", nested, nullable = true)))

  "toAvroSchema/toSparkSchema" should "round-trip the schema (nullable ⇄ union(null,T))" in {
    val avro = AvroBridge.toAvroSchema(schema, "rec")
    AvroBridge.toSparkSchema(avro) shouldBe schema
  }

  "encodeRow/decodeRow" should "round-trip rows with collections, nulls and nested records" in {
    val avro = AvroBridge.toAvroSchema(schema, "rec")
    val row = Row(7L, "alpha", 1.5, Seq("a", "b"), Map("k" -> 1, "j" -> 2),
      Array[Byte](1, 2, 3), Row(9, null))
    val back = AvroBridge.decodeRow(AvroBridge.encodeRow(row, avro), avro)
    back.getLong(0) shouldBe 7L
    back.getString(1) shouldBe "alpha"
    back.getDouble(2) shouldBe 1.5
    back.getSeq[String](3) shouldBe Seq("a", "b")
    back.getMap[String, Int](4) shouldBe Map("k" -> 1, "j" -> 2)
    back.getAs[Array[Byte]](5).toSeq shouldBe Seq[Byte](1, 2, 3)
    back.getStruct(6) shouldBe Row(9, null)

    val withNulls = Row(8L, "beta", null, Seq.empty[String], Map.empty[String, Int], null, null)
    AvroBridge.decodeRow(AvroBridge.encodeRow(withNulls, avro), avro) shouldBe withNulls
  }

  it should "round-trip timestamps as timestamp-micros" in {
    val st = StructType(Seq(StructField("ts", TimestampType, nullable = false)))
    val avro = AvroBridge.toAvroSchema(st, "t")
    val instant = java.time.Instant.parse("2024-01-01T12:34:56.123456Z")
    val back = AvroBridge.decodeRow(AvroBridge.encodeRow(Row(instant), avro), avro)
    back.getAs[java.time.Instant](0) shouldBe instant
  }

  "schema evolution" should "fill added-with-default fields on read (AvroProjectionSpec)" in {
    val writerSt = StructType(Seq(StructField("a", IntegerType, nullable = false)))
    val writer = AvroBridge.toAvroSchema(writerSt, "rec")
    // reader adds nullable field b (default null) — reference add-with-default
    val readerSt = StructType(Seq(
      StructField("a", IntegerType, nullable = false),
      StructField("b", StringType, nullable = true)))
    val reader = AvroBridge.toAvroSchema(readerSt, "rec")
    val bytes = AvroBridge.encodeRow(Row(5), writer)
    AvroBridge.decodeRow(bytes, writer, Some(reader)) shouldBe Row(5, null)
  }

  it should "drop removed fields and follow aliases on rename" in {
    val writerSt = StructType(Seq(
      StructField("keep", IntegerType, nullable = false),
      StructField("dropme", StringType, nullable = false)))
    val writer = AvroBridge.toAvroSchema(writerSt, "rec")
    // reader drops `dropme` and renames `keep` → `kept` via alias
    val renamed = new Schema.Field("kept", Schema.create(Schema.Type.INT), null, null)
    renamed.addAlias("keep")
    val reader = Schema.createRecord("rec", null, "graft", false, List(renamed).asJava)
    val bytes = AvroBridge.encodeRow(Row(3, "gone"), writer)
    val back = AvroBridge.decodeRow(bytes, writer, Some(reader))
    back shouldBe Row(3)
  }

  "MemorySchemaRegistry" should "register content-hashed schemas once and resolve by framed id" in {
    val reg = new MemorySchemaRegistry
    val st = StructType(Seq(StructField("v", StringType, nullable = false)))
    val framed1 = reg.write(Row("one"), st)
    val framed2 = reg.write(Row("two"), st)
    // same schema → same id in the frame
    AvroBridge.unframe(framed1)._1 shouldBe AvroBridge.unframe(framed2)._1
    reg.read(framed1) shouldBe Row("one")
    reg.read(framed2) shouldBe Row("two")
  }

  it should "agree with the column-level framing in GraftFunctions" in {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions
    import spark.implicits._
    val payload = "hello".getBytes("UTF-8")
    val jvmFramed = AvroBridge.frame(payload, 42)
    val sparkFramed = Seq("hello").toDF("s")
      .select(GraftFunctions.wrapRegistry(encode(col("s"), "UTF-8"), lit(42)))
      .as[Array[Byte]].head()
    sparkFramed.toSeq shouldBe jvmFramed.toSeq
  }

  "the bridge over a DataFrame" should "round-trip rows through a binary column distributed" in {
    import spark.implicits._
    val st = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = false)))
    val avroJson = AvroBridge.toAvroSchema(st, "kv").toString
    val data = (1L to 100L).map(i => (i, s"val$i"))
    val encoded = data.toDF("k", "v")
      .mapPartitions { it =>
        val sch = new Schema.Parser().parse(avroJson)
        it.map(r => AvroBridge.encodeRow(r, sch))
      }(org.apache.spark.sql.Encoders.BINARY)
    val decoded = encoded.mapPartitions { it =>
      val sch = new Schema.Parser().parse(avroJson)
      it.map { b => val r = AvroBridge.decodeRow(b, sch); (r.getLong(0), r.getString(1)) }
    }.collect().sortBy(_._1)
    decoded.toSeq shouldBe data
  }
}
