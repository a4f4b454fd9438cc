package graft.serde

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Catalyst ⇄ Avro schema/value bridge.
  *
  * The reference uses one Avro-reflected type system across Kafka, state,
  * messaging and its Spark connector
  * (reference: avro/.../record/AvroRecord.scala:421-541, mapping table in
  * SURVEY §1.2); reader/writer schema projection (rename via alias,
  * add-with-default, drop) at AvroRecord.scala:259-297. This module maps
  * `StructType` ⇄ Avro `Schema` with the same correspondences
  * (nullable ⇄ union(null,T), Map[String,_] ⇄ map, Timestamp ⇄
  * timestamp-micros) and round-trips `Row`s through binary Avro, with
  * evolution handled by Avro's resolving decoder — the same machinery the
  * reference's ScalaAvroProjector drives.
  *
  * The 5-byte registry framing (magic 0 + schema id BE,
  * AvroSerde.scala:123-138) lives column-side in
  * `GraftFunctions.wrapRegistry/unwrapRegistry/registrySchemaId` and
  * byte-side here in `frame`/`unframe`.
  */
object AvroBridge {

  // ------------------------------------------------------------------
  // Schema mapping
  // ------------------------------------------------------------------

  def toAvroSchema(st: StructType, name: String = "record", namespace: String = "graft"): Schema = {
    val fields = st.fields.map { f =>
      val base = toAvroType(f.dataType, s"${name}_${f.name}", namespace)
      val sch =
        if (f.nullable) Schema.createUnion(List(Schema.create(Schema.Type.NULL), base).asJava)
        else base
      new Schema.Field(f.name, sch,
        null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, namespace, false, fields.toList.asJava)
  }

  private def toAvroType(dt: DataType, name: String, ns: String): Schema = dt match {
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case TimestampType | TimestampNTZType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale).addToSchema(Schema.create(Schema.Type.BYTES))
    case ArrayType(et, containsNull) =>
      val e = toAvroType(et, s"${name}_item", ns)
      Schema.createArray(
        if (containsNull) Schema.createUnion(List(Schema.create(Schema.Type.NULL), e).asJava) else e)
    case MapType(StringType, vt, valueContainsNull) =>
      val v = toAvroType(vt, s"${name}_value", ns)
      Schema.createMap(
        if (valueContainsNull) Schema.createUnion(List(Schema.create(Schema.Type.NULL), v).asJava) else v)
    case st: StructType => toAvroSchema(st, name, ns)
    case other => throw new IllegalArgumentException(s"unsupported Spark type for Avro: $other")
  }

  def toSparkSchema(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD, s"expected record, got ${schema.getType}")
    StructType(schema.getFields.asScala.map { f =>
      val (dt, nullable) = toSparkType(f.schema())
      StructField(f.name(), dt, nullable)
    }.toSeq)
  }

  /** True for the reference's UUID encoding: fixed(16) carrying a uuid
    * logical type (AvroRecord.scala:494-497 puts LogicalTypes.uuid on a
    * fixed, not the standard string form). */
  private def isUuidFixed(s: Schema): Boolean =
    s.getType == Schema.Type.FIXED && s.getFixedSize == 16 &&
      ((s.getLogicalType != null && s.getLogicalType.getName == "uuid") ||
        "uuid" == s.getProp("logicalType"))

  /** Non-null branches of a union, in declaration order — the order is the
    * tag space of the tagged-struct encoding. */
  private def unionBranches(s: Schema): Seq[Schema] =
    s.getTypes.asScala.filter(_.getType != Schema.Type.NULL).toSeq

  /** Field name for a union branch in the tagged struct: the Avro type name
    * (record/enum/fixed name, or primitive type name), deduplicated by
    * position if two branches share one. */
  private def branchFieldNames(branches: Seq[Schema]): Seq[String] = {
    val raw = branches.map(_.getName)
    raw.zipWithIndex.map { case (n, i) => if (raw.count(_ == n) > 1) s"${n}_$i" else n }
  }

  /** Spark image of a multi-branch union (SURVEY §1.2: Spark SQL has no
    * native union type): struct(_tag INT, <branch0> T0, …, <branchN> TN)
    * where _tag indexes the NON-NULL branches in declaration order and
    * exactly the field at position _tag+1 is non-null. */
  def taggedUnionType(s: Schema): StructType = {
    val branches = unionBranches(s)
    StructType(
      StructField("_tag", IntegerType, nullable = false) +:
        branchFieldNames(branches).zip(branches).map { case (n, b) =>
          StructField(n, toSparkType(b)._1, nullable = true)
        })
  }

  private def toSparkType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val branches = unionBranches(s)
      val hasNull = s.getTypes.size() != branches.size
      if (branches.size == 1) (toSparkType(branches.head)._1, true)
      else (taggedUnionType(s), hasNull)
    case Schema.Type.INT =>
      if (s.getLogicalType != null && s.getLogicalType.getName == "date") (DateType, false)
      else (IntegerType, false)
    case Schema.Type.LONG =>
      if (s.getLogicalType != null && s.getLogicalType.getName == "timestamp-micros")
        (TimestampType, false)
      else (LongType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.BYTES => s.getLogicalType match {
      case dec: LogicalTypes.Decimal => (DecimalType(dec.getPrecision, dec.getScale), false)
      case _ => (BinaryType, false)
    }
    case Schema.Type.FIXED =>
      if (isUuidFixed(s)) (StringType, false)
      else s.getLogicalType match {
        case dec: LogicalTypes.Decimal => (DecimalType(dec.getPrecision, dec.getScale), false)
        case _ => (BinaryType, false)
      }
    case Schema.Type.ENUM => (StringType, false)
    case Schema.Type.ARRAY =>
      val (et, n) = toSparkType(s.getElementType)
      (ArrayType(et, containsNull = n), false)
    case Schema.Type.MAP =>
      val (vt, n) = toSparkType(s.getValueType)
      (MapType(StringType, vt, valueContainsNull = n), false)
    case Schema.Type.RECORD => (toSparkSchema(s), false)
    case other => throw new IllegalArgumentException(s"unsupported Avro type: $other")
  }

  // ------------------------------------------------------------------
  // Row ⇄ binary
  // ------------------------------------------------------------------

  def encodeRow(row: Row, schema: Schema): Array[Byte] = {
    val rec = rowToRecord(row, schema)
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  /** Decode with an optional distinct reader schema — Avro's resolving
    * decoder applies the reference's projection semantics (drop fields,
    * fill defaults, follow aliases). */
  def decodeRow(bytes: Array[Byte], writer: Schema, reader: Option[Schema] = None): Row = {
    val rd = new GenericDatumReader[GenericRecord](writer, reader.getOrElse(writer))
    val dec = DecoderFactory.get().binaryDecoder(bytes, null)
    recordToRow(rd.read(null, dec), reader.getOrElse(writer))
  }

  private def rowToRecord(row: Row, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    // positional: rows from mapPartitions/tests may carry no schema;
    // field order is the StructType order by construction
    schema.getFields.asScala.zipWithIndex.foreach { case (f, i) =>
      rec.put(f.name(), toAvroValue(row.get(i), f.schema()))
    }
    rec
  }

  private def uuidToBytes(u: java.util.UUID): Array[Byte] = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
    bb.array()
  }

  /** Schema-directed Spark → Avro value conversion. Unions: union(null,T)
    * maps a nullable value; multi-branch unions expect the tagged-struct Row
    * (`taggedUnionType`) and encode the branch `_tag` selects. */
  private def toAvroValue(v: Any, s: Schema): Any = s.getType match {
    case Schema.Type.UNION =>
      val branches = unionBranches(s)
      if (branches.size == 1) { if (v == null) null else toAvroValue(v, branches.head) }
      else if (v == null) null
      else {
        val row = v.asInstanceOf[Row]
        val tag = row.getInt(0)
        require(tag >= 0 && tag < branches.size,
          s"union tag $tag out of range for ${branches.size} branches in $s")
        toAvroValue(row.get(tag + 1), branches(tag))
      }
    case Schema.Type.RECORD => if (v == null) null else rowToRecord(v.asInstanceOf[Row], s)
    case Schema.Type.ARRAY => v match {
      case null => null
      case seq: Seq[_] => seq.map(toAvroValue(_, s.getElementType)).asJava
    }
    case Schema.Type.MAP => v match {
      case null => null
      case m: Map[_, _] =>
        m.map { case (k, x) => k.toString -> toAvroValue(x, s.getValueType) }.asJava
    }
    case Schema.Type.ENUM =>
      if (v == null) null
      else {
        val sym = v.toString
        require(s.hasEnumSymbol(sym), s"'$sym' is not a symbol of enum ${s.getFullName}: ${s.getEnumSymbols}")
        new GenericData.EnumSymbol(s, sym)
      }
    case Schema.Type.FIXED => v match {
      case null => null
      case str: String if isUuidFixed(s) =>
        new GenericData.Fixed(s, uuidToBytes(java.util.UUID.fromString(str)))
      case u: java.util.UUID => new GenericData.Fixed(s, uuidToBytes(u))
      case b: Array[Byte] =>
        require(b.length == s.getFixedSize,
          s"fixed(${s.getFixedSize}) ${s.getFullName} got ${b.length} bytes")
        new GenericData.Fixed(s, b)
    }
    case _ => v match {
      case null => null
      case b: Array[Byte] => ByteBuffer.wrap(b)
      // decimal(bytes): two's-complement unscaled value at the SCHEMA scale
      // (Avro's wire rule) — rescale first so 1.5 encodes identically at
      // scale 2 regardless of the input representation's scale. Strict: a
      // value needing MORE scale than the schema (1.005 into decimal(18,2))
      // is a caller bug, not something to round away silently — but name
      // the schema in the error instead of a bare ArithmeticException
      case bd: java.math.BigDecimal =>
        ByteBuffer.wrap(rescaleExact(bd, s).unscaledValue().toByteArray)
      case bd: scala.math.BigDecimal =>
        ByteBuffer.wrap(rescaleExact(bd.underlying(), s).unscaledValue().toByteArray)
      case ts: java.sql.Timestamp => ts.getTime * 1000L + (ts.getNanos / 1000) % 1000
      case ts: java.time.Instant => ts.getEpochSecond * 1000000L + ts.getNano / 1000
      case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
      case d: java.time.LocalDate => d.toEpochDay.toInt
      case other => other
    }
  }

  private def rescaleExact(bd: java.math.BigDecimal, s: Schema): java.math.BigDecimal = {
    val dec = s.getLogicalType.asInstanceOf[LogicalTypes.Decimal]
    try bd.setScale(dec.getScale)
    catch {
      case _: ArithmeticException => throw new IllegalArgumentException(
        s"decimal value $bd (scale ${bd.scale}) does not fit " +
          s"decimal(${dec.getPrecision},${dec.getScale}) of ${s.getFullName} without rounding")
    }
  }

  private def recordToRow(rec: GenericRecord, schema: Schema): Row = {
    val values = schema.getFields.asScala.map { f =>
      fromAvroValue(rec.get(f.name()), f.schema())
    }
    Row.fromSeq(values.toSeq)
  }

  /** Schema-directed Avro → Spark value conversion (inverse of
    * `toAvroValue`; multi-branch unions come back as the tagged struct with
    * exactly one non-null branch field). */
  private def fromAvroValue(v: Any, s: Schema): Any = s.getType match {
    case Schema.Type.UNION =>
      val branches = unionBranches(s)
      if (branches.size == 1) { if (v == null) null else fromAvroValue(v, branches.head) }
      else if (v == null) null
      else {
        // resolveUnion indexes the FULL branch list (incl. null) by value
        // class/name; re-map to the non-null tag space
        val fullIdx = GenericData.get().resolveUnion(s, v)
        val branch = s.getTypes.get(fullIdx)
        val tag = branches.indexOf(branch)
        val cells = new Array[Any](branches.size + 1)
        cells(0) = tag
        cells(tag + 1) = fromAvroValue(v, branch)
        Row.fromSeq(cells.toSeq)
      }
    case Schema.Type.RECORD =>
      if (v == null) null else recordToRow(v.asInstanceOf[GenericRecord], s)
    case Schema.Type.ARRAY => v match {
      case null => null
      case l: java.util.List[_] => l.asScala.map(fromAvroValue(_, s.getElementType)).toSeq
    }
    case Schema.Type.MAP => v match {
      case null => null
      case m: java.util.Map[_, _] =>
        m.asScala.map { case (k, x) => k.toString -> fromAvroValue(x, s.getValueType) }.toMap
    }
    case Schema.Type.ENUM => if (v == null) null else v.toString
    case Schema.Type.FIXED => v match {
      case null => null
      case f: GenericData.Fixed =>
        if (isUuidFixed(s)) {
          val bb = ByteBuffer.wrap(f.bytes())
          new java.util.UUID(bb.getLong, bb.getLong).toString
        } else if (s.getLogicalType.isInstanceOf[LogicalTypes.Decimal]) {
          new java.math.BigDecimal(new java.math.BigInteger(f.bytes()),
            s.getLogicalType.asInstanceOf[LogicalTypes.Decimal].getScale)
        } else f.bytes().clone()
    }
    case _ => v match {
      case null => null
      case b: ByteBuffer if s.getLogicalType.isInstanceOf[LogicalTypes.Decimal] =>
        val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr)
        new java.math.BigDecimal(new java.math.BigInteger(arr),
          s.getLogicalType.asInstanceOf[LogicalTypes.Decimal].getScale)
      case b: ByteBuffer =>
        val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
      case u: org.apache.avro.util.Utf8 => u.toString
      case l: java.lang.Long if s.getLogicalType != null &&
          s.getLogicalType.getName == "timestamp-micros" =>
        java.time.Instant.ofEpochSecond(l / 1000000L, (l % 1000000L) * 1000L)
      case i: java.lang.Integer if s.getLogicalType != null &&
          s.getLogicalType.getName == "date" =>
        java.time.LocalDate.ofEpochDay(i.longValue())
      case other => other
    }
  }

  // ------------------------------------------------------------------
  // Registry framing (byte-level; column-level lives in GraftFunctions)
  // ------------------------------------------------------------------

  def frame(payload: Array[Byte], schemaId: Int): Array[Byte] = {
    val out = new Array[Byte](payload.length + 5)
    out(0) = 0 // magic
    out(1) = ((schemaId >> 24) & 0xff).toByte
    out(2) = ((schemaId >> 16) & 0xff).toByte
    out(3) = ((schemaId >> 8) & 0xff).toByte
    out(4) = (schemaId & 0xff).toByte
    System.arraycopy(payload, 0, out, 5, payload.length)
    out
  }

  def unframe(framed: Array[Byte]): (Int, Array[Byte]) = {
    require(framed.length >= 5 && framed(0) == 0, "bad registry frame")
    val id = ((framed(1) & 0xff) << 24) | ((framed(2) & 0xff) << 16) |
      ((framed(3) & 0xff) << 8) | (framed(4) & 0xff)
    (id, java.util.Arrays.copyOfRange(framed, 5, framed.length))
  }

  // ------------------------------------------------------------------
  // §2.6c coercions, ASCII-safe (q208 — r13 verdict #3)
  // ------------------------------------------------------------------

  /** Surface the serde coercions (reference AvroRecord.scala:443-509 —
    * fixed(16)+uuid ⇄ canonical text, enum ⇄ symbol string, @Fixed ⇄
    * bytes) in a batch-oracle-comparable form: each input value is encoded
    * as a SINGLE-FIELD Avro record, so the record body IS exactly the
    * coerced wire form — raw big-endian msb‖lsb for the uuid, the zigzag
    * varint symbol index for the enum, the raw bytes for the fixed — then
    * decoded back. The `*_wire` columns pin the ENCODE direction
    * byte-exactly (a uuid byte-order or enum index-lookup bug changes
    * them); the `*_rt` columns pin DECODE. Runs distributed
    * (mapPartitions at the serde boundary, same as the multimodal codec).
    *
    * Input df columns, positionally: (doc_id LONG, uuid_text STRING —
    * canonical 8-4-4-4-12 lowercase, enum_sym STRING ∈ symbols,
    * fixed8 BINARY(8)). */
  def coercionAudit(df: org.apache.spark.sql.DataFrame, symbols: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    require(symbols.nonEmpty && symbols.forall(_.matches("[A-Za-z][A-Za-z0-9_]*")),
      "enum symbols must be valid Avro names")
    val out = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("uuid_wire", BinaryType, nullable = false),
      StructField("uuid_rt", StringType, nullable = false),
      StructField("enum_wire", BinaryType, nullable = false),
      StructField("enum_rt", StringType, nullable = false),
      StructField("fixed_wire", BinaryType, nullable = false)))
    val symJson = symbols.map(s => "\"" + s + "\"").mkString(",")
    val uuidJson = """{"type":"record","name":"cu","namespace":"graft",
      |"fields":[{"name":"v","type":{"type":"fixed","name":"u16","size":16,
      |"logicalType":"uuid"}}]}""".stripMargin.replace("\n", "")
    val enumJson = s"""{"type":"record","name":"ce","namespace":"graft",
      |"fields":[{"name":"v","type":{"type":"enum","name":"sym",
      |"symbols":[$symJson]}}]}""".stripMargin.replace("\n", "")
    val fixedJson = """{"type":"record","name":"cf","namespace":"graft",
      |"fields":[{"name":"v","type":{"type":"fixed","name":"f8","size":8}}]}"""
      .stripMargin.replace("\n", "")
    val enc = org.apache.spark.sql.Encoders.row(out)
    df.mapPartitions { it =>
      val us = new Schema.Parser().parse(uuidJson)
      val es = new Schema.Parser().parse(enumJson)
      val fsch = new Schema.Parser().parse(fixedJson)
      it.map { r =>
        val uw = encodeRow(Row(r.getString(1)), us)
        val ew = encodeRow(Row(r.getString(2)), es)
        val fw = encodeRow(Row(r.getAs[Array[Byte]](3)), fsch)
        Row(r.getLong(0), uw, decodeRow(uw, us).getString(0),
          ew, decodeRow(ew, es).getString(0), fw)
      }
    }(enc)
  }
}

/** In-memory schema registry with the reference's semantics: content-hashed
  * registration, id-addressed lookup (MemorySchemaRegistry.scala). */
final class MemorySchemaRegistry {
  private val byId = scala.collection.concurrent.TrieMap.empty[Int, Schema]
  private val ids = new java.util.concurrent.atomic.AtomicInteger(0)
  private val byFingerprint = scala.collection.concurrent.TrieMap.empty[Long, Int]

  def register(schema: Schema): Int = {
    val fp = org.apache.avro.SchemaNormalization.parsingFingerprint64(schema)
    byFingerprint.getOrElseUpdate(fp, {
      val id = ids.incrementAndGet()
      byId.put(id, schema)
      id
    })
  }

  def schema(id: Int): Option[Schema] = byId.get(id)

  /** Serialize a Row with the registry wire format. */
  def write(row: Row, sparkSchema: StructType): Array[Byte] = {
    val avro = AvroBridge.toAvroSchema(sparkSchema)
    AvroBridge.frame(AvroBridge.encodeRow(row, avro), register(avro))
  }

  /** Read a framed payload, projecting to `readerSchema` if given. */
  def read(framed: Array[Byte], readerSchema: Option[Schema] = None): Row = {
    val (id, payload) = AvroBridge.unframe(framed)
    val writer = schema(id).getOrElse(throw new IllegalArgumentException(s"unknown schema id $id"))
    AvroBridge.decodeRow(payload, writer, readerSchema)
  }
}
