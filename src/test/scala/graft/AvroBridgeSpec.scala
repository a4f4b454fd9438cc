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

  it should "round-trip decimals as bytes + decimal logical type at the schema scale" in {
    val dec = StructType(Seq(StructField("amount", DecimalType(18, 2), nullable = true)))
    val avro = AvroBridge.toAvroSchema(dec, "d")
    AvroBridge.toSparkSchema(avro) shouldBe dec
    // inputs at a DIFFERENT scale must rescale to the schema's (Avro wire rule)
    for (in <- Seq(new java.math.BigDecimal("12.5"), new java.math.BigDecimal("12.50"),
        new java.math.BigDecimal("-0.070"))) {
      val out = AvroBridge.decodeRow(AvroBridge.encodeRow(Row(in), avro), avro)
        .getAs[java.math.BigDecimal](0)
      out.scale() shouldBe 2
      out.compareTo(in) shouldBe 0
    }
    AvroBridge.decodeRow(AvroBridge.encodeRow(Row(null), avro), avro) shouldBe Row(null)
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

/** Multi-branch unions, enum, fixed and UUID — the reference's sealed-trait
  * @Union encoding (AvroRecord.scala:443-537, expectations in
  * AvroUnionSpec.scala): Spark has no union type, so a multi-branch union
  * maps to struct(_tag, <branch fields>) per SURVEY §1.2. */
class AvroUnionBridgeSpec extends SparkSpec {

  // union of two records — the reference's `Me(myPet: Pet)` shape with
  // branches ordered like @Union(1) Cat, @Union(2) Dog
  private val petUnion = new Schema.Parser().parse(
    """{"type":"record","name":"Me","namespace":"graft.test","fields":[
      |  {"name":"myPet","type":[
      |    {"type":"record","name":"Cat","fields":[
      |      {"name":"name","type":"string"},
      |      {"name":"opt","type":["int","null"],"default":1}]},
      |    {"type":"record","name":"Dog","fields":[
      |      {"name":"name","type":"string"}]}]}]}""".stripMargin)

  "toSparkSchema" should "map a 2-branch record union to a tagged struct" in {
    val st = AvroBridge.toSparkSchema(petUnion)
    val pet = st("myPet").dataType.asInstanceOf[StructType]
    pet.fieldNames.toSeq shouldBe Seq("_tag", "Cat", "Dog")
    pet("_tag").dataType shouldBe IntegerType
    pet("Cat").dataType.asInstanceOf[StructType].fieldNames.toSeq shouldBe Seq("name", "opt")
    pet("Dog").dataType.asInstanceOf[StructType].fieldNames.toSeq shouldBe Seq("name")
    st("myPet").nullable shouldBe false // no null branch
  }

  "encodeRow/decodeRow" should "round-trip both branches of a record union" in {
    val dog = Row(Row(1, null, Row("Finn")))            // _tag 1 = Dog
    val cat = Row(Row(0, Row("Fionna", 3), null))       // _tag 0 = Cat, opt=3
    AvroBridge.decodeRow(AvroBridge.encodeRow(dog, petUnion), petUnion) shouldBe dog
    AvroBridge.decodeRow(AvroBridge.encodeRow(cat, petUnion), petUnion) shouldBe cat
  }

  it should "round-trip a union inside an array (They.theirPets)" in {
    val they = new Schema.Parser().parse(
      """{"type":"record","name":"They","namespace":"graft.test","fields":[
        |  {"name":"theirPets","type":{"type":"array","items":[
        |    {"type":"record","name":"Cat","fields":[{"name":"name","type":"string"}]},
        |    {"type":"record","name":"Dog","fields":[{"name":"name","type":"string"}]}]}}]}""".stripMargin)
    val row = Row(Seq(Row(1, null, Row("Finn")), Row(0, Row("Fionna"), null)))
    AvroBridge.decodeRow(AvroBridge.encodeRow(row, they), they) shouldBe row
  }

  it should "round-trip a union of primitives (int|string) with a null branch" in {
    val s = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[
        |  {"name":"v","type":["null","int","string"],"default":null}]}""".stripMargin)
    val st = AvroBridge.toSparkSchema(s)
    st("v").nullable shouldBe true
    st("v").dataType.asInstanceOf[StructType].fieldNames.toSeq shouldBe Seq("_tag", "int", "string")
    val asInt = Row(Row(0, 42, null))
    val asStr = Row(Row(1, null, "hi"))
    val asNull = Row(null)
    AvroBridge.decodeRow(AvroBridge.encodeRow(asInt, s), s) shouldBe asInt
    AvroBridge.decodeRow(AvroBridge.encodeRow(asStr, s), s) shouldBe asStr
    AvroBridge.decodeRow(AvroBridge.encodeRow(asNull, s), s) shouldBe asNull
  }

  "enum" should "map to string and round-trip with symbol validation" in {
    val s = new Schema.Parser().parse(
      """{"type":"record","name":"E","fields":[
        |  {"name":"side","type":{"type":"enum","name":"Side","symbols":["BUY","SELL"]}}]}""".stripMargin)
    AvroBridge.toSparkSchema(s)("side").dataType shouldBe StringType
    val row = Row("SELL")
    AvroBridge.decodeRow(AvroBridge.encodeRow(row, s), s) shouldBe row
    an[IllegalArgumentException] should be thrownBy
      AvroBridge.encodeRow(Row("HOLD"), s)
  }

  "fixed" should "round-trip as binary with size enforcement" in {
    val s = new Schema.Parser().parse(
      """{"type":"record","name":"F","fields":[
        |  {"name":"k","type":{"type":"fixed","name":"K8","size":8}}]}""".stripMargin)
    AvroBridge.toSparkSchema(s)("k").dataType shouldBe BinaryType
    val bytes = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)
    val back = AvroBridge.decodeRow(AvroBridge.encodeRow(Row(bytes), s), s)
    back.getAs[Array[Byte]](0).toSeq shouldBe bytes.toSeq
    an[IllegalArgumentException] should be thrownBy
      AvroBridge.encodeRow(Row(Array[Byte](1, 2)), s)
  }

  "uuid" should "map fixed(16) logicalType uuid to a canonical string (reference AvroRecord.scala:494-497)" in {
    val s = new Schema.Parser().parse(
      """{"type":"record","name":"U","fields":[
        |  {"name":"id","type":{"type":"fixed","name":"id","size":16,"logicalType":"uuid"}}]}""".stripMargin)
    AvroBridge.toSparkSchema(s)("id").dataType shouldBe StringType
    val u = "123e4567-e89b-12d3-a456-426614174000"
    val back = AvroBridge.decodeRow(AvroBridge.encodeRow(Row(u), s), s)
    back.getString(0) shouldBe u
  }

  "a union round-trip over a DataFrame" should "survive distributed encode/decode" in {
    import spark.implicits._
    val avroJson = petUnion.toString
    val data = (1L to 50L).map { i =>
      if (i % 2 == 0) Row(Row(1, null, Row(s"dog$i"))) else Row(Row(0, Row(s"cat$i", i.toInt), null))
    }
    val encoded = spark.sparkContext.parallelize(data, 4).map { r =>
      val sch = new Schema.Parser().parse(avroJson)
      AvroBridge.encodeRow(r, sch)
    }
    val decoded = encoded.map { b =>
      val sch = new Schema.Parser().parse(avroJson)
      val r = AvroBridge.decodeRow(b, sch)
      val pet = r.getStruct(0)
      if (pet.getInt(0) == 1) ("dog", pet.getStruct(2).getString(0))
      else ("cat", pet.getStruct(1).getString(0))
    }.collect().toSeq
    decoded.count(_._1 == "dog") shouldBe 25
    decoded.count(_._1 == "cat") shouldBe 25
  }
}
