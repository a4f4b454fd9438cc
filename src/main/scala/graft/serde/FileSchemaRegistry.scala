package graft.serde

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaNormalization}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/** File-backed schema registry — the durable single-host sibling of
  * [[MemorySchemaRegistry]] and [[HttpSchemaRegistry]], completing the
  * registry matrix (reference: avro/src/main/scala/io/amient/affinity/avro/
  * LocalSchemaRegistry.scala:49-116).
  *
  * Layout matches the reference's contract: each schema lives in
  * `<id>.avsc` (pretty-printed Avro JSON; the id IS the filename, so
  * id-addressed lookup is one file read and ids stay stable across
  * processes), and each subject's version history is a comma-separated id
  * list in `<subject>.dat`, appended on first registration of a new schema
  * content. Registration is guarded by an atomic `.lock` create-file so
  * concurrent writers (two local processes sharing the directory) cannot
  * double-allocate an id — the reference's `hypersynchronized` discipline
  * (LocalSchemaRegistry.scala:97-115). Reads are lock-free.
  *
  * Scale note: the registry holds SCHEMAS (dozens of tiny files), never
  * data — executors resolve ids through a broadcast snapshot or the
  * registry cache, so no job-critical path touches this directory per row.
  */
final class FileSchemaRegistry(dir: Path) {
  require(dir != null, "registry path required")
  private def ensureDir(): Unit = if (!Files.exists(dir)) Files.createDirectories(dir)

  private def schemaPath(id: Int): Path = dir.resolve(s"$id.avsc")
  private def subjectPath(subject: String): Path = {
    require(subject.nonEmpty && !subject.exists(c => c == '/' || c == '.'),
      s"subject must be a plain name, got '$subject'")
    dir.resolve(s"$subject.dat")
  }

  /** All ids ever registered under `subject`, oldest first. */
  def versions(subject: String): Seq[Int] = {
    val p = subjectPath(subject)
    if (!Files.exists(p)) Seq.empty
    else new String(Files.readAllBytes(p), UTF_8).trim match {
      case "" => Seq.empty
      case s  => s.split(',').toSeq.map(_.trim.toInt)
    }
  }

  /** Id-addressed schema lookup (one file read; None if unregistered). */
  def schema(id: Int): Option[Schema] =
    if (!Files.exists(schemaPath(id))) None
    else Some(new Schema.Parser().parse(
      new String(Files.readAllBytes(schemaPath(id)), UTF_8)))

  def latest(subject: String): Option[Schema] =
    versions(subject).lastOption.flatMap(schema)

  /** Register `schema` under `subject`; idempotent on schema CONTENT
    * (parsing-fingerprint equality, so whitespace/doc differences don't
    * mint new ids). Returns the stable id. */
  def register(subject: String, schema: Schema): Int = locked {
    val fp = SchemaNormalization.parsingFingerprint64(schema)
    val existing = versions(subject)
    existing.find(id => this.schema(id).exists(
        s => SchemaNormalization.parsingFingerprint64(s) == fp))
      .getOrElse {
        val id = nextId()
        Files.write(schemaPath(id), schema.toString(true).getBytes(UTF_8))
        Files.write(subjectPath(subject),
          (existing :+ id).mkString(",").getBytes(UTF_8))
        id
      }
  }

  /** First unused id: max(existing) + 1, scanning `<id>.avsc` filenames —
    * ids allocated by OTHER processes sharing the directory are seen. */
  private def nextId(): Int = {
    val used = Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case n if n.endsWith(".avsc") => n.stripSuffix(".avsc") }
      .flatMap(_.toIntOption)
      .toSeq
    if (used.isEmpty) 1 else used.max + 1
  }

  /** Cross-process mutual exclusion via atomic lock-file creation; waits up
    * to ~30 s then fails loudly (a stale lock means a crashed writer —
    * surfacing it beats silently corrupting the id space). */
  private def locked[X](body: => X): X = synchronized {
    ensureDir()
    val lock = dir.resolve(".lock")
    def tryAcquire(): Boolean =
      try { Files.createFile(lock); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    var tries = 300
    while (!tryAcquire()) {
      tries -= 1
      if (tries <= 0) throw new IllegalStateException(
        s"registry lock $lock held too long (crashed writer? delete it to recover)")
      Thread.sleep(100)
    }
    try body finally Files.deleteIfExists(lock)
  }

  /** Serialize a Row in the registry wire format (magic 0 + 4-byte id +
    * avro payload), registering the schema under `subject` if new. */
  def write(row: Row, sparkSchema: StructType, subject: String): Array[Byte] = {
    val avro = AvroBridge.toAvroSchema(sparkSchema)
    AvroBridge.frame(AvroBridge.encodeRow(row, avro), register(subject, avro))
  }

  /** Read a framed payload, resolving the writer schema by id from disk and
    * projecting to `readerSchema` if given. */
  def read(framed: Array[Byte], readerSchema: Option[Schema] = None): Row = {
    val (id, payload) = AvroBridge.unframe(framed)
    val writer = schema(id).getOrElse(
      throw new IllegalArgumentException(s"unknown schema id $id in $dir"))
    AvroBridge.decodeRow(payload, writer, readerSchema)
  }
}
